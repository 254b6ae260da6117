package graft

import org.apache.spark.sql.functions._
import graft.operators.{EncodeOps, ExperimentOps, MetricOps, QualityChecks}

/** Round-12 operator specs: two-sample Anderson–Darling against the
  * hand-expanded Scholz–Stephens midrank blocks, Fleiss' kappa on the
  * textbook two-rater panel, mSPRT crossing under a strong effect,
  * DP noisy-count determinism and bounded noise, SES backtest against
  * an exact binary-weight level, candidate-key flags, and RFM codes on
  * separable users.
  */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  test("andersonDarlingTwoSample: hand-expanded blocks on {1,2} vs " +
    "{1,3} give 0.318182") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 3.0))
      .toDF("side", "v")
    val r = MetricOps.andersonDarlingTwoSample(df, "side", "v", "a", "b")
      .collect()(0)
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    // per-block inner sums: 0 + 4/44 + 4/12 per side; A2 = 3/4 · 2·(s/2)
    val expect = 0.75 * (1.0 / 11 + 1.0 / 3)
    assert(math.abs(r.getAs[Double]("a2") - expect) < 1e-6)
  }

  test("fleissKappa: agree+split items give κ = −1/3; oddly-sized " +
    "items are dropped") {
    val df = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"), (3L, "a"))
      .toDF("item", "cat")
    val r = MetricOps.fleissKappa(df, "item", "cat", nRaters = 2)
      .collect()(0)
    assert(r.getAs[Long]("n_items") == 2L)
    assert(r.getAs[Long]("dropped_items") == 1L)
    assert(r.getAs[Double]("p_bar") == 0.5)
    assert(r.getAs[Double]("p_e") == 0.625)
    assert(math.abs(r.getAs[Double]("kappa") - (-0.333333)) < 1e-9)
  }

  test("msprt: zero effect stays under the boundary, a clean split " +
    "crosses it") {
    val rows = for (d <- 0L until 5L; i <- 0 until 10; arm <- Seq(0, 1))
      yield (arm, d, if (arm == 0) 1.0 else 0.0)
    val df = rows.toDF("arm", "day", "y")
    val r = ExperimentOps.msprt(df, "arm", "day", "y", 0, 1, tau = 0.1)
      .orderBy("day").collect()
    assert(r.length == 5)
    assert(r.last.getAs[Int]("crossed") == 1)
    assert(r.last.getAs[Double]("mean_diff") == 1.0)
    val same = rows.map { case (a, d, _) => (a, d, 0.5) }
      .toDF("arm", "day", "y")
    // zero variance → vn = 0 → null llr, never crossed
    val r0 = ExperimentOps.msprt(same, "arm", "day", "y", 0, 1, 0.1)
      .collect()
    assert(r0.forall(_.getAs[Int]("crossed") == 0))
  }

  test("dpNoisyCounts: deterministic across runs, bounded Laplace " +
    "noise, ε column carried") {
    val df = (0 until 100).map(i => s"g${i % 3}").toDF("g")
    val a = QualityChecks.dpNoisyCounts(df, Seq("g"), epsilon = 1.0)
      .orderBy("g").collect()
    val b = QualityChecks.dpNoisyCounts(df, Seq("g"), epsilon = 1.0)
      .orderBy("g").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    a.foreach { r =>
      val noise = r.getAs[Double]("noisy_count") -
        r.getAs[Long]("true_count")
      assert(math.abs(noise) < 35.0) // |ln(2^-48)| bound at ε=1
      // epsilon_nominal: mechanism calibration, NOT a privacy guarantee
      // (seeded noise) — the name is part of the output contract
      assert(r.getAs[Double]("epsilon_nominal") == 1.0)
    }
    // different seed → different draw
    val c = QualityChecks.dpNoisyCounts(df, Seq("g"), 1.0, seed = "x")
      .orderBy("g").collect()
    assert(a.map(_.getAs[Double]("noisy_count")).toSeq !=
      c.map(_.getAs[Double]("noisy_count")).toSeq)
  }

  test("sesBacktest: binary-weight level (10,20,40 → 30) scored on " +
    "y=60") {
    val df = Seq(("g", 0L, 10.0), ("g", 1L, 20.0), ("g", 2L, 40.0),
      ("g", 3L, 60.0)).toDF("g", "x", "y")
    val r = MetricOps.sesBacktest(df, "g", "x", "y", splitX = 3L)
      .collect()(0)
    assert(r.getAs[Double]("forecast") == 30.0)
    assert(math.abs(r.getAs[Double]("smape") - 2.0 * 30 / 90) < 1e-6)
    assert(r.getAs[Double]("wape") == 0.5)
  }

  test("candidateKeys: duplicate-bearing combos are flagged non-key") {
    val df = Seq((1, "x"), (1, "y"), (2, "x")).toDF("a", "b")
    val r = QualityChecks.candidateKeys(df, Seq(Seq("a"), Seq("a", "b")))
      .orderBy("combo").collect()
    val single = r.find(_.getAs[String]("combo") == "a").get
    assert(single.getAs[Int]("is_key") == 0)
    assert(single.getAs[Long]("max_group") == 2L)
    val pair = r.find(_.getAs[String]("combo") == "a,b").get
    assert(pair.getAs[Int]("is_key") == 1)
    assert(pair.getAs[Long]("n_distinct") == 3L)
  }

  test("rfmSegments: separable users land in distinct monetary bands " +
    "with exact cent means") {
    val df = (1 to 5).map(i =>
      (i.toLong, "2024-01-10 00:00:00", i * 10.0 + 0.01))
      .toDF("u", "ts", "v")
      .withColumn("ts", to_timestamp(col("ts")))
    val r = EncodeOps.rfmSegments(df, "u", "ts", "v")
      .orderBy("m_q").collect()
    assert(r.length == 5)
    assert(r.map(_.getAs[Int]("r_q")).forall(_ == 0)) // same day
    assert(r.map(_.getAs[Int]("f_q")).forall(_ == 0)) // same freq
    assert(r.map(_.getAs[Int]("m_q")).toSeq == Seq(0, 1, 2, 3, 4))
    assert(r(0).getAs[Double]("avg_monetary") == 10.01)
    assert(r(4).getAs[Double]("total_monetary") == 50.01)
  }
}
