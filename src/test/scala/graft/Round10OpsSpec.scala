package graft

import org.apache.spark.sql.functions._
import graft.operators.{EncodeOps, ExperimentOps, GraphOps, MetricOps,
  QualityChecks, SamplingOps}

/** Round-10 operator specs: Cochran's Q / Cochran–Armitage against the
  * hand formulas, runs-test against a hand-counted sign sequence,
  * energy distance against enumerated pairs, modularity on a two-
  * community toy graph, Neyman allocation on a zero-variance stratum,
  * l-diversity flagging, and the quantile-normalization decile map on
  * shifted uniform groups.
  */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------------- cochran Q

  test("cochranQ: hand-computed 4-block 3-treatment table, missing " +
    "cells default to 0") {
    // blocks × treatments: b1 (1,1,0), b2 (1,0,0), b3 (1,1,1), b4 all 0
    // — b4 appears only via one explicit 0 cell, the grid fills the rest.
    // G = (3,2,1), T = 6, ΣB² = 14, k = 3 →
    // Q = 2·(3·14 − 36)/(18 − 14) = 3.0
    val df = Seq(
      (1L, "t1", 1), (1L, "t2", 1), (1L, "t3", 0),
      (2L, "t1", 1), (2L, "t2", 0), (2L, "t3", 0),
      (3L, "t1", 1), (3L, "t2", 1), (3L, "t3", 1),
      (4L, "t1", 0))
      .toDF("b", "t", "x")
    val r = MetricOps.cochranQ(df, "b", "t", "x").collect()(0)
    assert(r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("n_blocks") == 4L)
    assert(r.getAs[Long]("t_total") == 6L)
    assert(r.getAs[Long]("df") == 2L)
    assert(math.abs(r.getAs[Double]("q_stat") - 3.0) < 1e-9)
  }

  test("cochranQ: degenerate all-ones table yields null q_stat") {
    // every block all-1 → kT − ΣB² = 0 → guarded null, not a NaN
    val df = Seq((1L, "a", 1), (1L, "b", 1), (2L, "a", 1), (2L, "b", 1))
      .toDF("b", "t", "x")
    val r = MetricOps.cochranQ(df, "b", "t", "x").collect()(0)
    assert(r.isNullAt(r.fieldIndex("q_stat")))
  }

  // ---------------------------------------------------- cochran–armitage

  test("cochranArmitage: perfectly monotone dose-response gives z = 2") {
    // scores 1,2,3 with (n,r) = (2,0),(2,1),(2,2):
    // T = 8 − 3·12/6 = 2, z = 12/√(3·3·24/6) = 2.0
    val df = Seq(
      ("g", 1, 0), ("g", 1, 0), ("g", 2, 1), ("g", 2, 0),
      ("g", 3, 1), ("g", 3, 1))
      .toDF("grp", "score", "y")
    val r = MetricOps.cochranArmitage(df, "grp", "score", "y").collect()(0)
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Long]("positives") == 3L)
    assert(math.abs(r.getAs[Double]("t_stat") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("z") - 2.0) < 1e-9)
  }

  test("cochranArmitage: all-positive group guards z to null") {
    val df = Seq(("g", 1, 1), ("g", 2, 1)).toDF("grp", "score", "y")
    val r = MetricOps.cochranArmitage(df, "grp", "score", "y").collect()(0)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  // ------------------------------------------------------------ runs test

  test("runsTest: hand-counted runs over an alternating series") {
    // days 1..6 values 1,9,2,8,3,7 → median pick = 3 (dropped);
    // sign sequence by day: 0,1,0,1,1 → runs 4, n₁=3 above, n₂=2 below
    // μ = 3.4, σ² = 0.84, z = 0.6/√0.84
    val df = Seq(("g", 1L, 1.0), ("g", 2L, 9.0), ("g", 3L, 2.0),
      ("g", 4L, 8.0), ("g", 5L, 3.0), ("g", 6L, 7.0))
      .toDF("grp", "day", "y")
    val r = MetricOps.runsTest(df, "grp", "day", "y").collect()(0)
    assert(r.getAs[Long]("n_above") == 3L)
    assert(r.getAs[Long]("n_below") == 2L)
    assert(r.getAs[Long]("runs") == 4L)
    assert(math.abs(r.getAs[Double]("expected_runs") - 3.4) < 1e-9)
    assert(math.abs(r.getAs[Double]("z") - 0.6 / math.sqrt(0.84)) < 1e-6)
  }

  test("runsTest: one-sided series (all above after median drop) " +
    "guards z") {
    val df = Seq(("g", 1L, 1.0), ("g", 2L, 5.0), ("g", 3L, 5.0))
      .toDF("grp", "day", "y")
    // median = 5 (cum 2·2 ≥ 3 at v=5); only the v=1 row survives → below
    val r = MetricOps.runsTest(df, "grp", "day", "y").collect()(0)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  // ------------------------------------------------------ energy distance

  test("energyDistance: enumerated pairs on {0,2} vs {1,3}") {
    // E|X−Y| = (1+3+1+1)/4 = 1.5, E|X−X'| = 1, E|Y−Y'| = 1 → D² = 1
    val df = Seq(("a", 0.0), ("a", 2.0), ("b", 1.0), ("b", 3.0))
      .toDF("side", "v")
    val r = MetricOps.energyDistance(df, "side", "v", "a", "b").collect()(0)
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(math.abs(r.getAs[Double]("e_xy") - 1.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("e_xx") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("e_yy") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("energy_dist") - 1.0) < 1e-9)
  }

  test("energyDistance: identical distributions give ~0") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("side", "v")
    val r = MetricOps.energyDistance(df, "side", "v", "a", "b").collect()(0)
    assert(math.abs(r.getAs[Double]("energy_dist")) < 1e-9)
  }

  // ----------------------------------------------------------- modularity

  test("modularity: triangle + detached edge, two communities") {
    // edges 1-2,2-3,3-1,4-5; communities {1,2,3}→0, {4,5}→1; m = 4
    // Q₀ = 3/4 − (6/8)² = 0.1875 ; Q₁ = 1/4 − (2/8)² = 0.1875
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L))
      .toDF("a", "b")
    val labels = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L))
      .toDF("node", "lab")
    val out = GraphOps.modularity(edges, "a", "b", labels, "node", "lab")
      .orderBy("community").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("internal_edges") == 3L)
    assert(out(0).getAs[Long]("degree_mass") == 6L)
    assert(math.abs(out(0).getAs[Double]("q_contrib") - 0.1875) < 1e-9)
    assert(math.abs(out(1).getAs[Double]("q_contrib") - 0.1875) < 1e-9)
  }

  test("modularity: single community scores 0 (all mass internal)") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val labels = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("node", "lab")
    val r = GraphOps.modularity(edges, "a", "b", labels, "node", "lab")
      .collect()(0)
    // L = m and d = 2m → Q = 1 − 1 = 0
    assert(math.abs(r.getAs[Double]("q_contrib")) < 1e-9)
  }

  // ---------------------------------------------------- neyman allocation

  test("neymanAllocation: zero-variance stratum gets zero optimal " +
    "budget, proportional unaffected") {
    val df = Seq(("s1", 0.0), ("s1", 10.0),
      ("s2", 5.0), ("s2", 5.0), ("s2", 5.0), ("s2", 5.0))
      .toDF("stratum", "v")
    val out = SamplingOps.neymanAllocation(df, "stratum", "v", 100L)
      .orderBy("stratum").collect()
    val s1 = out(0); val s2 = out(1)
    assert(math.abs(s1.getAs[Double]("sd_h") - 5.0) < 1e-9)
    assert(math.abs(s2.getAs[Double]("sd_h")) < 1e-9)
    assert(math.abs(s1.getAs[Double]("neyman_alloc") - 100.0) < 1e-9)
    assert(math.abs(s2.getAs[Double]("neyman_alloc")) < 1e-9)
    assert(math.abs(s1.getAs[Double]("prop_alloc") - 33.33) < 1e-9)
    assert(math.abs(s2.getAs[Double]("prop_alloc") - 66.67) < 1e-9)
  }

  // ---------------------------------------------------------- l-diversity

  test("lDiversityAudit: flags only groups under the distinct floor") {
    val df = Seq(
      ("q1", "a"), ("q1", "a"), ("q1", "b"), // 2 distinct < 3 → flagged
      ("q2", "a"), ("q2", "b"), ("q2", "c")) // 3 distinct → passes
      .toDF("qi", "sens")
    val out = QualityChecks.lDiversityAudit(df, Seq("qi"), "sens", 3)
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("qi") == "q1")
    assert(out(0).getAs[Long]("group_size") == 3L)
    assert(out(0).getAs[Long]("l_distinct") == 2L)
  }

  // ------------------------------------------------- quantile normalize

  test("quantileNormalizeMap: shifted uniform groups map onto pooled " +
    "deciles") {
    val df = ((1 to 10).map(v => ("a", v.toDouble)) ++
      (11 to 20).map(v => ("b", v.toDouble))).toDF("grp", "v")
    val out = EncodeOps.quantileNormalizeMap(df, "grp", "v")
      .orderBy("grp", "q").collect()
    assert(out.length == 18)
    // group a decile q = q; pooled decile q = 2q
    val a5 = out.find(r => r.getAs[String]("grp") == "a" &&
      r.getAs[Int]("q") == 5).get
    assert(math.abs(a5.getAs[Double]("group_q") - 5.0) < 1e-9)
    assert(math.abs(a5.getAs[Double]("pooled_q") - 10.0) < 1e-9)
    val b9 = out.find(r => r.getAs[String]("grp") == "b" &&
      r.getAs[Int]("q") == 9).get
    assert(math.abs(b9.getAs[Double]("group_q") - 19.0) < 1e-9)
    assert(math.abs(b9.getAs[Double]("pooled_q") - 18.0) < 1e-9)
  }

  // ----------------------------------------------------------------- mase

  test("maseBacktest: linear ramp vs season-2 naive gives MASE 2") {
    // y = day on days 1..5, season 2: |y−y₋₂| = 2, |y−y₋₁| = 1
    val df = (1L to 5L).map(d => ("g", d, d)).toDF("grp", "day", "y")
    val r = MetricOps.maseBacktest(df, "grp", "day", "y", season = 2)
      .collect()(0)
    assert(r.getAs[Long]("n_eval") == 3L)
    assert(math.abs(r.getAs[Double]("mae_seasonal") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("mae_naive") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("mase") - 2.0) < 1e-9)
  }

  // ------------------------------------------------------------------ cvm

  test("cvmTwoSample: hand-computed discrete statistic on {1,2} vs " +
    "{1,3}") {
    // pooled CDF gaps: only v=2 differs (F=1, G=1/2), weight 1 →
    // T = (2·2/16)·(1/4) = 0.0625
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 3.0))
      .toDF("side", "v")
    val r = MetricOps.cvmTwoSample(df, "side", "v", "a", "b").collect()(0)
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(math.abs(r.getAs[Double]("cvm_stat") - 0.0625) < 1e-9)
  }

  test("cvmTwoSample: identical samples give 0") {
    val df = Seq(("a", 1.0), ("a", 5.0), ("b", 1.0), ("b", 5.0))
      .toDF("side", "v")
    val r = MetricOps.cvmTwoSample(df, "side", "v", "a", "b").collect()(0)
    assert(math.abs(r.getAs[Double]("cvm_stat")) < 1e-9)
  }

  // ----------------------------------------------------------------- pacf

  test("pacf: alternating series matches the Durbin–Levinson recursion " +
    "run on its own ACF") {
    // y = 1,2,1,2,1,2 → ρ₁ = −5/6, ρ₂ = 2/3, ρ₃ = −1/2 (snapped 6 dp)
    val df = (1L to 6L).map(d => ("g", d, if (d % 2 == 0) 2L else 1L))
      .toDF("grp", "day", "y")
    val out = MetricOps.pacf(df, "grp", "day", "y")
      .orderBy("lag").collect()
    val r1 = BigDecimal(-1.25 / 1.5)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r2 = BigDecimal(1.0 / 1.5)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r3 = BigDecimal(-0.75 / 1.5)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val p2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val p21 = r1 * (1.0 - p2)
    val p3 = (r3 - p21 * r2 - p2 * r1) / (1.0 - p21 * r1 - p2 * r2)
    assert(math.abs(out(0).getAs[Double]("pacf") - r1) < 1e-9)
    assert(math.abs(out(1).getAs[Double]("pacf") - p2) < 1e-6)
    assert(math.abs(out(2).getAs[Double]("pacf") - p3) < 1e-6)
  }

  // --------------------------------------------------------- jonckheere

  test("jonckheereTerpstra: fully separated ordered groups") {
    // {1,2} < {3,4} entirely: JT = 4, E = 2, Var = 120/72
    val df = Seq((1L, 1.0), (1L, 2.0), (2L, 3.0), (2L, 4.0))
      .toDF("g", "v")
    val r = MetricOps.jonckheereTerpstra(df, "g", "v", roundVals = 2)
      .collect()(0)
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("k") == 2L)
    assert(math.abs(r.getAs[Double]("jt_stat") - 4.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("e_jt") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("z") -
      2.0 / math.sqrt(120.0 / 72.0)) < 1e-6)
  }

  test("jonckheereTerpstra: cross-group tie counts half") {
    val df = Seq((1L, 5.0), (2L, 5.0)).toDF("g", "v")
    val r = MetricOps.jonckheereTerpstra(df, "g", "v").collect()(0)
    assert(math.abs(r.getAs[Double]("jt_stat") - 0.5) < 1e-9)
  }

  // ----------------------------------------------------------- page trend

  test("pageTrend: perfectly monotone blocks give z = 2") {
    // 2 blocks × 3 ordered treatments, values rise with treatment:
    // L = 1·2 + 2·4 + 3·6 = 28, E = 24, Var = 4 → z = 2
    val df = Seq(
      (1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 3.0),
      (2L, 1L, 1.0), (2L, 2L, 2.0), (2L, 3L, 3.0))
      .toDF("blk", "trt", "v")
    val r = MetricOps.pageTrend(df, "blk", "trt", "v").collect()(0)
    assert(r.getAs[Long]("n_blocks") == 2L && r.getAs[Long]("k") == 3L)
    assert(math.abs(r.getAs[Double]("l_stat") - 28.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("e_l") - 24.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("z") - 2.0) < 1e-9)
  }

  // --------------------------------------------------------- siegel slope

  test("siegelSlope: one wild point cannot move the repeated-medians " +
    "slope") {
    val df = (Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0),
      (5L, 100.0))).map { case (x, y) => ("g", x, y) }
      .toDF("grp", "x", "y")
    val r = MetricOps.siegelSlope(df, "grp", "x", "y").collect()(0)
    assert(r.getAs[Long]("n_points") == 5L)
    assert(math.abs(r.getAs[Double]("siegel_slope") - 1.0) < 1e-9)
  }

  // ------------------------------------------------------- stl anomalies

  test("stlAnomalies: an isolated spike is the top-ratio anomaly") {
    val df = (0L to 20L).map(d =>
      ("g", d, (10 + (d % 2) * 2 + (if (d == 10) 90 else 0)).toDouble))
      .toDF("grp", "day", "y")
    val out = MetricOps.stlAnomalies(df, "grp", "day", "y",
      halfWin = 3, k = 2.0).collect()
    assert(out.nonEmpty, "spike must be reported")
    val top = out.maxBy(_.getAs[Double]("mad_ratio"))
    assert(top.getAs[Long]("bucket") == 10L)
  }

  // --------------------------------------------------- poisson bootstrap

  test("poissonBootstrapCi: constant values collapse the band to the " +
    "mean") {
    val df = (1L to 50L).map(i => ("g", i, 5.0)).toDF("grp", "id", "v")
    val r = ExperimentOps.poissonBootstrapCi(df, "grp", "id", "v",
      nBoot = 16).collect()(0)
    assert(r.getAs[Long]("n") == 50L)
    assert(math.abs(r.getAs[Double]("mean") - 5.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("boot_lo") - 5.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("boot_hi") - 5.0) < 1e-9)
  }

  test("poissonBootstrapCi: spread values straddle the mean") {
    val df = (0L until 100L).map(i => ("g", i, i.toDouble))
      .toDF("grp", "id", "v")
    val r = ExperimentOps.poissonBootstrapCi(df, "grp", "id", "v",
      nBoot = 32).collect()(0)
    assert(r.getAs[Double]("boot_lo") < r.getAs[Double]("mean"))
    assert(r.getAs[Double]("boot_hi") > r.getAs[Double]("mean"))
  }

  // -------------------------------------------------------- profile drift

  test("profileDrift: per-column nulls, distincts, and mean shift") {
    val a = Seq[(java.lang.Long, String)]((1L, "x"), (2L, "x"),
      (null, "x")).toDF("v", "s")
    val b = Seq[(java.lang.Long, String)]((4L, "y"), (4L, "y"),
      (4L, "y"), (4L, "y")).toDF("v", "s")
    val out = QualityChecks.profileDrift(a, b, Seq("v", "s"))
      .orderBy("col_name").collect()
    val sv = out.find(_.getAs[String]("col_name") == "v").get
    assert(sv.getAs[Long]("n_a") == 3L && sv.getAs[Long]("n_b") == 4L)
    assert(math.abs(sv.getAs[Double]("null_frac_a") - 0.333333) < 1e-9)
    assert(sv.getAs[Long]("distinct_a") == 2L)
    assert(math.abs(sv.getAs[Double]("mean_a") - 1.5) < 1e-9)
    assert(math.abs(sv.getAs[Double]("mean_shift") - 2.5) < 1e-9)
    val ss = out.find(_.getAs[String]("col_name") == "s").get
    assert(ss.isNullAt(ss.fieldIndex("mean_a")))
    assert(ss.getAs[Long]("distinct_b") == 1L)
  }
}
