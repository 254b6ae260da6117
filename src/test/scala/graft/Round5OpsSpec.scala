package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, EncodeOps, GraphOps, MetricOps, RetrievalOps, SketchOps, TextOps}

/** Round-5 operators: mutual information, Spearman rank correlation,
  * Count-Min / Bloom sketches, token entropy, JS divergence,
  * containment join, dyadic time decay, robust scaling.
  */
class Round5OpsSpec extends SparkSpec {
  import spark.implicits._

  // --------------------------------------------------- mutual information

  test("mutualInfo: identical binary columns carry H(X) = ln 2 nats") {
    val df = Seq((0, 0), (1, 1), (0, 0), (1, 1)).toDF("x", "y")
    val row = MetricOps.mutualInfo(df, "x", "y").collect().head
    assert(math.abs(row.getDouble(0) - math.log(2)) < 1e-6)
    assert(row.getLong(1) == 2L) // cells: (0,0) and (1,1)
    assert(row.getLong(2) == 4L)
  }

  test("mutualInfo: independent columns score zero") {
    val df = (for { x <- Seq("a", "b"); y <- Seq(0, 1) } yield (x, y))
      .toDF("x", "y") // perfectly balanced 2×2 → independent
    val mi = MetricOps.mutualInfo(df, "x", "y").collect().head.getDouble(0)
    assert(math.abs(mi) < 1e-9)
  }

  // --------------------------------------------------------- spearman

  test("spearman: monotone nonlinear relation gives 1, reversed gives -1") {
    val df = (1 to 20).map(i => ("g", i.toDouble, (i * i).toDouble)).toDF("g", "x", "y")
      .union((1 to 20).map(i => ("h", i.toDouble, (-i * i).toDouble)).toDF("g", "x", "y"))
    val out = MetricOps.spearman(df, "g", "x", "y")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("g") == 1.0 && out("h") == -1.0)
  }

  test("spearman: all-tied column yields null (zero rank variance)") {
    val df = (1 to 5).map(i => ("g", 1.0, i.toDouble)).toDF("g", "x", "y")
    val row = MetricOps.spearman(df, "g", "x", "y").collect().head
    assert(row.isNullAt(1))
  }

  // ------------------------------------------------------------- sketches

  test("cmsHeavyHitters: estimates never under-count and rank the top key") {
    val df = (Seq.fill(50)("hot") ++ (1 to 30).map(i => s"k$i")).toDF("k")
    val rows = SketchOps.cmsHeavyHitters(df, "k", topN = 5)
      .orderBy(col("exact_c").desc, col("k")).collect()
    assert(rows.head.getString(0) == "hot" && rows.head.getLong(1) == 50L)
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(1))) // est >= exact
  }

  test("bloomMembership: no false negatives, false positives non-negative") {
    val build = (1 to 200).map(i => i.toLong).toDF("k")
    val probe = (1 to 1000).map(i => (i.toLong, if (i % 2 == 0) "even" else "odd"))
      .toDF("pk", "seg")
    val out = SketchOps.bloomMembership(build, "k", probe, "pk", "seg")
      .collect()
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(3)) // bloom_pos >= true members
      assert(r.getLong(4) >= 0L)
    }
    assert(out.map(_.getLong(3)).sum == 200L) // every built key found
  }

  // ----------------------------------------------------- entropy / drift

  test("tokenEntropy: uniform vocabulary maxes normalized entropy") {
    val df = Seq("a b c d", "a b c d").toDF("text")
    val row = TextOps.tokenEntropy(df, "text").collect().head
    assert(row.getLong(0) == 8L && row.getLong(1) == 4L)
    assert(math.abs(row.getDouble(2) - math.log(4)) < 1e-5)
    assert(row.getDouble(3) == 1.0)
  }

  test("jsDivergence: identical slices → 0; disjoint vocab → ln 2") {
    val same = Seq((0L, "x y z"), (1L, "x y z")).toDF("doc_id", "text")
    val js0 = TextOps.jsDivergence(same, "text", col("doc_id") % 2 === 0)
      .collect().head.getDouble(2)
    assert(math.abs(js0) < 1e-9)
    val disjoint = Seq((0L, "a b c"), (1L, "p q r")).toDF("doc_id", "text")
    val js1 = TextOps.jsDivergence(disjoint, "text", col("doc_id") % 2 === 0)
      .collect().head.getDouble(2)
    assert(math.abs(js1 - math.log(2)) < 1e-5)
  }

  // ------------------------------------------------------- containment

  test("containmentJoin: full inclusion is directional") {
    val inner = "w1 w2 w3 w4 w5 w6"
    val docs = Seq(
      (1L, inner), // fully contained in 2
      (2L, s"pre1 pre2 pre3 $inner post1 post2 post3"),
      (3L, "q1 q2 q3 q4 q5 q6 q7 q8")).toDF("doc_id", "text")
    val out = DedupOps.containmentJoin(docs, "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 2L)) == 1.0)    // every shingle of 1 appears in 2
    assert(!out.contains((2L, 1L))) // 2 is not contained in 1
    assert(!out.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  // ----------------------------------------------------------- decay

  test("decayedPopularity: dyadic weights are exact") {
    val day = 86400000000L
    val ref = 1700000000000000L
    val df = Seq(
      (1L, ref),              // age 0 → weight 1
      (1L, ref - 31 * day),   // one half-life (30d) → 1/2
      (2L, ref - 61 * day))   // two half-lives → 1/4
      .toDF("user_id", "tsu")
      .withColumn("ts", timestamp_micros(col("tsu")))
    val out = RetrievalOps.decayedPopularity(df, "user_id", "ts", 30)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) == ((2L, 1.5)))   // exactly 1 + 1/2
    assert(out(2L) == ((1L, 0.25)))  // exactly 1/4
  }

  test("histogramQuantile: uniform data interpolates near-exactly") {
    // 1..1000 uniform, binWidth 10 → estimate within one bin of exact
    val df = (1 to 1000).map(i => ("g", i.toDouble)).toDF("g", "v")
    val row = SketchOps.histogramQuantile(df, "g", "v", 10.0, 200, 0.5)
      .collect().head
    assert(math.abs(row.getDouble(1) - row.getDouble(2)) <= 10.0)
    assert(row.getDouble(3) == math.abs(row.getDouble(1) - row.getDouble(2)))
  }

  test("histogramQuantile: overflow values clamp into the last bin") {
    val df = (Seq.fill(99)(1.0) ++ Seq(1e9)).map(("g", _)).toDF("g", "v")
    val row = SketchOps.histogramQuantile(df, "g", "v", 10.0, 5, 0.99)
      .collect().head
    // q=0.99 target lands in the clamped last bin (bin 4), not bin 1e8
    assert(row.getDouble(1) <= 50.0)
  }

  // -------------------------------------------------------- pagerank

  test("pageRankPortable: star center dominates; mass conserved on a cycle") {
    val nodes = (1L to 5L).toDF("n")
    // star: everyone links to 1 (and back, to avoid dangling mass)
    val star = (2L to 5L).flatMap(i => Seq((i, 1L), (1L, i))).toDF("s", "d")
    val r = GraphOps.pageRankPortable(nodes, "n", star, "s", "d", 5)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) > r(2L) && r(2L) == r(3L) && r(3L) == r(4L))
    // 5-cycle: symmetric → all ranks equal 1/5, total mass exactly 1
    val cyc = (1L to 5L).map(i => (i, i % 5 + 1)).toDF("s", "d")
    val rc = GraphOps.pageRankPortable(nodes, "n", cyc, "s", "d", 3)
      .collect().map(_.getDouble(1))
    assert(rc.forall(_ == 0.2) && math.abs(rc.sum - 1.0) < 1e-9)
  }

  // ------------------------------------------------------ robust scaling

  test("robustScale: zero-IQR group scales to null, not Infinity") {
    // 4×5.0 + one outlier: p25 = p50 = p75 = 5 → IQR exactly 0
    val df = Seq(("g", 5.0), ("g", 5.0), ("g", 5.0), ("g", 5.0), ("g", 9.0))
      .toDF("g", "v")
    val out = EncodeOps.robustScale(df, "g", "v").select("v_robust").collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("tokenEntropy: single-token vocabulary yields 0 entropy, null norm") {
    val row = TextOps.tokenEntropy(Seq("a a a").toDF("text"), "text")
      .collect().head
    assert(row.getDouble(2) == 0.0 && row.isNullAt(3))
  }

  test("robustScale: median maps to 0 and IQR to unit distance") {
    val df = (1 to 101).map(i => ("g", i.toDouble)).toDF("g", "v")
    val out = EncodeOps.robustScale(df, "g", "v")
      .select("v", "v_robust").as[(Double, Double)].collect().toMap
    assert(out(51.0) == 0.0)          // median
    assert(out(76.0) == 0.5 && out(26.0) == -0.5) // quartiles at ±half IQR
  }
}
