package graft

import org.apache.spark.sql.functions._
import graft.operators.{MetricOps, QualityChecks}

/** Round-11 operator specs: the forecast-eval / robust-testing /
  * calibration / survival batch (q279–q291) against hand-computed
  * cases — pinball loss on interpolated train quantiles, Mood's median
  * on a split pool, PR-curve cumulative counts, Lorenz tie-block
  * pro-rata shares, G-test on independent vs deterministic tables,
  * t-closeness EMD, the gamma/Somers/tau-c readouts, Dunn z on two
  * clean groups, Bartlett on unequal variances, the exact Murphy
  * identity, a perfectly calibrated Hosmer–Lemeshow, and the
  * Nelson–Aalen / RMST curve pair on a 4-subject cohort.
  */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------------------- pinball loss

  test("pinballEval: interpolated per-slot train quantiles, holdout " +
    "loss and coverage") {
    // slot0 train {10,30} → q(.1)=12 q(.5)=20 q(.9)=28; slot1 {20,40}
    // → 22/30/38. test y=50 (slot0), 60 (slot1): every loss is
    // τ·(y−q) since y > q always.
    val df = Seq(("a", 0L, 10.0), ("a", 1L, 20.0), ("a", 2L, 30.0),
      ("a", 3L, 40.0), ("a", 4L, 50.0), ("a", 5L, 60.0))
      .toDF("g", "x", "y")
    val r = MetricOps.pinballEval(df, "g", "x", "y", splitX = 4L,
      season = 2).orderBy("tau").collect()
    assert(r.length == 3)
    assert(r.map(_.getAs[Long]("n_test")).forall(_ == 2L))
    assert(math.abs(r(0).getAs[Double]("pinball_loss") - 3.8) < 1e-9)
    assert(math.abs(r(1).getAs[Double]("pinball_loss") - 15.0) < 1e-9)
    assert(math.abs(r(2).getAs[Double]("pinball_loss") - 19.8) < 1e-9)
    assert(r.map(_.getAs[Double]("coverage")).forall(_ == 0.0))
  }

  // ------------------------------------------------------- Mood's median

  test("moodMedianTest: hand 2×2 above/below table on {1,2,3} vs " +
    "{3,4,5}") {
    // pooled lower median 3; above-counts (0,2), not-above (3,1) →
    // each group contributes 1.5 → chi2 = 3.
    val df = Seq(("g1", 1.0), ("g1", 2.0), ("g1", 3.0),
      ("g2", 3.0), ("g2", 4.0), ("g2", 5.0)).toDF("g", "v")
    val r = MetricOps.moodMedianTest(df, "g", "v").collect()(0)
    assert(r.getAs[Long]("n") == 6L && r.getAs[Long]("k") == 2L)
    assert(r.getAs[Long]("dof") == 1L)
    assert(r.getAs[Double]("grand_median") == 3.0)
    assert(math.abs(r.getAs[Double]("chi2") - 3.0) < 1e-9)
  }

  // ----------------------------------------------------------- PR curve

  test("prCurve: descending-threshold cumulative tp/fp with a tied " +
    "score block") {
    val df = Seq((1, 0.9), (0, 0.8), (1, 0.8), (0, 0.1))
      .toDF("y", "s")
    val r = MetricOps.prCurve(df, "y", "s")
      .orderBy(col("threshold").desc).collect()
    assert(r.length == 3)
    assert(r(0).getAs[Long]("tp") == 1L && r(0).getAs[Long]("fp") == 0L)
    assert(r(0).getAs[Double]("prec") == 1.0)
    assert(r(0).getAs[Double]("recall") == 0.5)
    assert(r(1).getAs[Long]("tp") == 2L && r(1).getAs[Long]("fp") == 1L)
    assert(math.abs(r(1).getAs[Double]("f1") - 0.8) < 1e-9)
    assert(r(2).getAs[Long]("fp") == 2L)
    assert(r(2).getAs[Double]("recall") == 1.0)
  }

  // -------------------------------------------------------- Lorenz curve

  test("lorenzCurve: tie blocks split pro-rata at decile boundaries") {
    // values {1,1,2,4}, S=8: shares at k units = 0,1,2,4,8 eighths.
    val df = Seq(1.0, 1.0, 2.0, 4.0).toDF("v")
    val r = MetricOps.lorenzCurve(df, "v").orderBy("point").collect()
    assert(r.length == 10)
    val share = r.map(_.getAs[Double]("value_share"))
    assert(share(0) == 0.0 && share(1) == 0.0) // k=0
    assert(share(2) == 0.125 && share(3) == 0.125) // k=1 inside the tie
    assert(share(4) == 0.25 && share(6) == 0.25) // k=2
    assert(share(7) == 0.5 && share(9) == 1.0) // k=3, k=4
  }

  // ------------------------------------------------------------- G-test

  test("gTest: independent table gives 0; deterministic 2×2 gives " +
    "2N·ln2") {
    val ind = Seq.tabulate(40)(i =>
      (if (i % 2 == 0) "a" else "b", i % 4 / 2)).toDF("x", "y")
    val r0 = MetricOps.gTest(ind, "x", "y").collect()(0)
    assert(r0.getAs[Double]("g_stat") == 0.0)
    val dep = (Seq.fill(10)(("a", 0)) ++ Seq.fill(10)(("b", 1)))
      .toDF("x", "y")
    val r1 = MetricOps.gTest(dep, "x", "y").collect()(0)
    assert(r1.getAs[Long]("dof") == 1L)
    assert(math.abs(r1.getAs[Double]("g_stat") - 40 * math.log(2)) < 1e-5)
    assert(math.abs(r1.getAs[Double]("mi_nats") - math.log(2)) < 1e-6)
  }

  // --------------------------------------------------------- t-closeness

  test("tCloseness: one-sided group vs global ordinal distribution") {
    // global bin pmf (0.75, 0.25); g1 all bin0 → EMD 0.25; g2 split
    // (0.5, 0.5) → EMD 0.25.
    val df = Seq(("g1", 0L), ("g1", 0L), ("g2", 0L), ("g2", 1L))
      .toDF("q", "bin")
    val r = QualityChecks.tCloseness(df, Seq("q"), "bin")
      .orderBy("q").collect()
    assert(r.length == 2)
    assert(r.forall(_.getAs[Long]("group_size") == 2L))
    assert(r.forall(_.getAs[Double]("t_closeness") == 0.25))
  }

  // -------------------------------------------------- ordinal association

  test("ordinalAssociation: clean monotone gives 1 everywhere; one " +
    "discordant pair gives 1/3") {
    val mono = Seq(("g", 1.0, 1.0), ("g", 2.0, 2.0), ("g", 3.0, 3.0))
      .toDF("grp", "x", "y")
    val r0 = MetricOps.ordinalAssociation(mono, "grp", "x", "y")
      .collect()(0)
    assert(r0.getAs[Long]("concordant") == 3L)
    assert(r0.getAs[Double]("gamma") == 1.0)
    assert(r0.getAs[Double]("somers_d_yx") == 1.0)
    assert(r0.getAs[Double]("tau_c") == 1.0)
    val mixed = Seq(("g", 1.0, 2.0), ("g", 2.0, 1.0), ("g", 3.0, 3.0))
      .toDF("grp", "x", "y")
    val r1 = MetricOps.ordinalAssociation(mixed, "grp", "x", "y")
      .collect()(0)
    assert(r1.getAs[Long]("concordant") == 2L)
    assert(r1.getAs[Long]("discordant") == 1L)
    assert(math.abs(r1.getAs[Double]("gamma") - 0.333333) < 1e-9)
    assert(math.abs(r1.getAs[Double]("tau_c") - 0.333333) < 1e-9)
  }

  // ---------------------------------------------------------- Dunn's test

  test("dunnTest: two separated pairs give z = -2/√(5/3)") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("g", "v")
    val r = MetricOps.dunnTest(df, "g", "v").collect()(0)
    assert(r.getAs[String]("g1") == "a" && r.getAs[String]("g2") == "b")
    assert(r.getAs[Double]("mean_rank_diff") == -2.0)
    assert(math.abs(r.getAs[Double]("z") -
      (-2.0 / math.sqrt(5.0 / 3))) < 1e-6)
  }

  // ------------------------------------------------------------ Bartlett

  test("bartlett: variances 2 vs 8 give (2ln5 − ln16)/1.5") {
    val df = Seq(("g1", 0.0), ("g1", 2.0), ("g2", 0.0), ("g2", 4.0))
      .toDF("g", "v")
    val r = MetricOps.bartlett(df, "g", "v").collect()(0)
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("k") == 2L)
    val expect = (2 * math.log(5) - math.log(16)) / 1.5
    assert(math.abs(r.getAs[Double]("chi2") - expect) < 1e-6)
  }

  test("bartlett: a zero-variance group nulls the statistic") {
    val df = Seq(("g1", 1.0), ("g1", 1.0), ("g2", 0.0), ("g2", 4.0))
      .toDF("g", "v")
    val r = MetricOps.bartlett(df, "g", "v").collect()(0)
    assert(r.isNullAt(r.fieldIndex("chi2")))
  }

  // ------------------------------------------------- Brier decomposition

  test("brierDecomposition: Murphy identity holds exactly on two " +
    "clean bins") {
    val df = Seq((0.2, 0), (0.2, 0), (0.8, 1), (0.8, 1)).toDF("p", "y")
    val r = MetricOps.brierDecomposition(df, "p", "y").collect()(0)
    assert(r.getAs[Double]("brier") == 0.04)
    assert(r.getAs[Double]("reliability") == 0.04)
    assert(r.getAs[Double]("resolution") == 0.25)
    assert(r.getAs[Double]("uncertainty") == 0.25)
  }

  // --------------------------------------------------- Hosmer–Lemeshow

  test("hosmerLemeshow: perfectly calibrated deciles give chi2 = 0 " +
    "with the zero-risk bin flagged degenerate") {
    val rows = for (i <- 0 until 10; j <- 0 until 10)
      yield (i / 10.0, if (j < i) 1 else 0)
    val df = rows.toDF("p", "y")
    val r = MetricOps.hosmerLemeshow(df, "p", "y").collect()(0)
    assert(r.getAs[Long]("n") == 100L)
    assert(r.getAs[Long]("n_bins") == 10L)
    assert(r.getAs[Double]("hl_chi2") == 0.0)
    assert(r.getAs[Long]("degenerate_bins") == 1L) // the E₁=0 decile
  }

  // ------------------------------------------------ Nelson–Aalen / RMST

  test("nelsonAalen: hand risk sets on a 4-subject cohort") {
    val df = Seq((1L, 1), (1L, 1), (2L, 0), (2L, 1)).toDF("dur", "ev")
    val r = MetricOps.nelsonAalen(df, "dur", "ev").orderBy("t").collect()
    assert(r(0).getAs[Long]("n_risk") == 4L)
    assert(r(0).getAs[Double]("cum_hazard") == 0.5)
    assert(r(1).getAs[Double]("cum_hazard") == 1.0)
    assert(math.abs(r(1).getAs[Double]("s_na") - math.exp(-1)) < 1e-6)
  }

  test("rmst: equals the piecewise KM integral (1.5 on the toy " +
    "cohort)") {
    val df = Seq((1L, 1), (1L, 1), (2L, 0), (2L, 1)).toDF("dur", "ev")
    val r = MetricOps.rmst(df, "dur", "ev").collect()(0)
    assert(r.getAs[Long]("tau") == 2L)
    assert(math.abs(r.getAs[Double]("rmst") - 1.5) < 1e-9)
  }

  test("rmst: a saturated final step (everyone events) still " +
    "integrates the curve") {
    // t=1: d=1/2 → S=.5; t=2: d=n=1 → S=0, δ = S_prev = .5.
    // ∫ = 1·1 + 1·0.5 = 1.5, τ=2.
    val df = Seq((1L, 1), (2L, 1)).toDF("dur", "ev")
    val r = MetricOps.rmst(df, "dur", "ev").collect()(0)
    assert(math.abs(r.getAs[Double]("rmst") - 1.5) < 1e-9)
  }
}
