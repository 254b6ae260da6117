package graft

import org.apache.spark.sql.functions._
import graft.operators.MetricOps

/** Round-15 operator specs: Yuen's trimmed t on identical and shifted
  * sides, dispersion index on constant vs bursty counts, temperature
  * weights' closed-form 3:1 case, per-period PSI of an identical vs
  * shifted week, and the weighted median pulled by mass.
  */
class Round15OpsSpec extends SparkSpec {
  import spark.implicits._

  test("yuenTrimmedTest: identical sides give t = 0, a shift moves " +
    "the trimmed means apart") {
    val vals = (1 to 10).map(_.toDouble)
    val same = (vals.map(("a", _)) ++ vals.map(("b", _)))
      .toDF("s", "v")
    val r0 = MetricOps.yuenTrimmedTest(same, "s", "v", "a", "b")
      .collect()(0)
    assert(r0.getAs[Double]("trimmed_mean_a") ==
      r0.getAs[Double]("trimmed_mean_b"))
    assert(r0.getAs[Double]("yuen_t") == 0.0)
    val shifted = (vals.map(("a", _)) ++ vals.map(v => ("b", v + 10)))
      .toDF("s", "v")
    val r1 = MetricOps.yuenTrimmedTest(shifted, "s", "v", "a", "b")
      .collect()(0)
    assert(r1.getAs[Double]("trimmed_mean_b") -
      r1.getAs[Double]("trimmed_mean_a") == 10.0)
    assert(r1.getAs[Double]("yuen_t") < -5.0)
  }

  test("dispersionIndex: constant series gives VMR 0, a burst gives " +
    "VMR = variance/mean") {
    val df = Seq(("c", 4L), ("c", 4L), ("c", 4L), ("c", 4L),
      ("b", 0L), ("b", 8L)).toDF("g", "y")
    val r = MetricOps.dispersionIndex(df, "g", "y").orderBy("g")
      .collect()
    val burst = r(0)
    assert(burst.getAs[Double]("mean") == 4.0)
    assert(burst.getAs[Double]("variance") == 32.0)
    assert(burst.getAs[Double]("vmr") == 8.0)
    val const = r(1)
    assert(const.getAs[Double]("vmr") == 0.0)
  }

  test("temperatureWeights: 90/10 split at alpha 0.5 gives exactly " +
    "3:1 weights") {
    val df = (Seq.fill(90)("big") ++ Seq.fill(10)("small")).toDF("d")
    val r = MetricOps.temperatureWeights(df, "d", alpha = 0.5,
      budget = 1000L).orderBy("d").collect()
    val big = r.find(_.getAs[String]("d") == "big").get
    val small = r.find(_.getAs[String]("d") == "small").get
    assert(big.getAs[Double]("p_natural") == 0.9)
    assert(big.getAs[Double]("weight") == 0.75)
    assert(small.getAs[Double]("weight") == 0.25)
    assert(big.getAs[Double]("expected_samples") == 750.0)
  }

  test("psiByPeriod: the baseline week scores 0, a shifted week " +
    "scores positive") {
    val rows = (0 until 100).map(i => (0L, (i % 4) * 50.0 + 1)) ++
      (0 until 100).map(i => (1L, (i % 4) * 50.0 + 1)) ++
      (0 until 100).map(i => (2L, ((i % 4) + 4) * 50.0 + 1))
    val df = rows.toDF("week", "v")
    val r = MetricOps.psiByPeriod(df, "v", "week", binWidth = 50.0,
      nBins = 10).orderBy("week").collect()
    assert(r(0).getAs[Double]("psi") == 0.0) // baseline vs itself
    assert(r(1).getAs[Double]("psi") == 0.0) // identical distribution
    assert(r(2).getAs[Double]("psi") > 1.0) // disjoint bins
  }

  test("weightedMedian: mass at the top pulls the median to 3") {
    val df = Seq(("g", 1.0, 1L), ("g", 2.0, 1L), ("g", 3.0, 10L))
      .toDF("g", "v", "w")
    val r = MetricOps.weightedMedian(df, "g", "v", "w").collect()(0)
    assert(r.getAs[Long]("total_weight") == 12L)
    assert(r.getAs[Double]("weighted_median") == 3.0)
  }
}
