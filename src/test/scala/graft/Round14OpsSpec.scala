package graft

import org.apache.spark.sql.functions._
import graft.operators.{MetricOps, QualityChecks}

/** Round-14 operator specs: Kuiper both-direction gaps, Cronbach α on
  * perfectly consistent items, a hand Chapman estimate, Gumbel moment
  * fit, partial correlation under perfect confounding and perfect
  * alignment, the neutral epi table, a hand Bowker χ², and seasonal
  * Mann–Kendall on slot-monotone series.
  */
class Round14OpsSpec extends SparkSpec {
  import spark.implicits._

  test("kuiperTwoSample: crossing ECDFs contribute to both D+ and D-") {
    val df = Seq(("a", 1.0), ("a", 4.0), ("b", 2.0), ("b", 3.0))
      .toDF("s", "v")
    val r = MetricOps.kuiperTwoSample(df, "s", "v", "a", "b")
      .collect()(0)
    assert(r.getAs[Double]("d_plus") == 0.5)
    assert(r.getAs[Double]("d_minus") == 0.5)
    assert(r.getAs[Double]("v_stat") == 1.0)
  }

  test("cronbachAlpha: perfectly correlated items give alpha 1; " +
    "short subjects are dropped") {
    val df = Seq((1L, 1, 1.0), (1L, 2, 1.0), (2L, 1, 2.0), (2L, 2, 2.0),
      (3L, 1, 3.0), (3L, 2, 3.0), (4L, 1, 9.0)) // subject 4 incomplete
      .toDF("s", "i", "v")
    val r = MetricOps.cronbachAlpha(df, "s", "i", "v", k = 2)
      .collect()(0)
    assert(r.getAs[Long]("n_subjects") == 3L)
    assert(r.getAs[Long]("k_items") == 2L)
    assert(r.getAs[Double]("var_total") == 4.0)
    assert(r.getAs[Double]("alpha") == 1.0)
  }

  test("chapmanEstimate: hand capture windows give N-hat 20/3 - 1") {
    val df = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 0), (4L, 1),
      (5L, 0), (5L, 1)).toDF("u", "side")
    val r = QualityChecks.chapmanEstimate(df, "u", "side", 0, 1)
      .collect()(0)
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("n_both") == 2L)
    assert(r.getAs[Long]("n_observed") == 5L)
    assert(math.abs(r.getAs[Double]("n_hat") - (20.0 / 3 - 1)) < 0.005)
  }

  test("gumbelFit: two-block moment fit matches the closed form") {
    val df = Seq(("g", 0L, 10L), ("g", 3L, 4L), ("g", 7L, 20L),
      ("g", 9L, 6L)).toDF("g", "x", "y")
    val r = MetricOps.gumbelFit(df, "g", "x", "y", blockSize = 7,
      level = 15.0).collect()(0)
    assert(r.getAs[Long]("n_blocks") == 2L)
    val beta = math.sqrt(50.0 * 6) / math.Pi
    assert(math.abs(r.getAs[Double]("beta") - beta) < 1e-6)
    assert(math.abs(r.getAs[Double]("mu") -
      (15.0 - 0.5772156649015329 * beta)) < 1e-6)
    val p = r.getAs[Double]("p_exceed")
    assert(p > 0 && p < 1)
  }

  test("partialCorrelation: aligned x,y keep r=1 after z; perfect " +
    "confounding nulls the partial") {
    val df = Seq(("g", 1.0, 1.0, 1.0), ("g", 2.0, 2.0, 1.0),
      ("g", 3.0, 3.0, 2.0), ("g", 4.0, 4.0, 2.0))
      .toDF("g", "x", "y", "z")
    val r = MetricOps.partialCorrelation(df, "g", "x", "y", "z")
      .collect()(0)
    assert(r.getAs[Double]("r_xy") == 1.0)
    assert(r.getAs[Double]("r_xy_given_z") == 1.0)
    val conf = Seq(("g", 1.0, 1.0, 1.0), ("g", 2.0, 2.0, 2.0),
      ("g", 3.0, 3.0, 3.0)).toDF("g", "x", "y", "z")
    val r1 = MetricOps.partialCorrelation(conf, "g", "x", "y", "z")
      .collect()(0)
    assert(r1.isNullAt(r1.fieldIndex("r_xy_given_z"))) // den = 0
  }

  test("epiTable: the balanced table is exactly neutral") {
    val rows = Seq.fill(10)((1, 1)) ++ Seq.fill(10)((1, 0)) ++
      Seq.fill(10)((0, 1)) ++ Seq.fill(10)((0, 0))
    val r = MetricOps.epiTable(rows.toDF("x", "y"), "x", "y")
      .collect()(0)
    assert(r.getAs[Double]("odds_ratio") == 1.0)
    assert(r.getAs[Double]("relative_risk") == 1.0)
    assert(r.getAs[Double]("risk_diff") == 0.0)
    assert(r.getAs[Double]("cohen_h") == 0.0)
    assert(r.getAs[Double]("or_lo") < 1.0 && r.getAs[Double]("or_hi") > 1.0)
  }

  test("bowkerSymmetry: hand flows give chi2 9/7 + 3") {
    val rows = Seq.fill(5)(("a", "b")) ++ Seq.fill(2)(("b", "a")) ++
      Seq.fill(3)(("a", "c")) ++ Seq.fill(4)(("c", "c")) // diag dropped
    val r = MetricOps.bowkerSymmetry(rows.toDF("f", "t"), "f", "t")
      .collect()(0)
    assert(r.getAs[Long]("n_offdiag") == 10L)
    assert(r.getAs[Long]("dof") == 2L)
    assert(math.abs(r.getAs[Double]("bowker_chi2") -
      (9.0 / 7 + 3.0)) < 1e-6)
  }

  test("seasonalMannKendall: slot-monotone series gives S = 6 and " +
    "the hand z") {
    val df = (0L until 6L).map(x => ("g", x, x.toDouble))
      .toDF("g", "x", "y")
    val r = MetricOps.seasonalMannKendall(df, "g", "x", "y", season = 2)
      .collect()(0)
    assert(r.getAs[Long]("s_stat") == 6L)
    val variance = 2 * (3.0 * 2 * 11) / 18
    assert(math.abs(r.getAs[Double]("z") - 5.0 / math.sqrt(variance))
      < 1e-6)
  }
}
