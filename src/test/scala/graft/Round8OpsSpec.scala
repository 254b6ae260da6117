package graft

import org.apache.spark.sql.functions._
import graft.operators.{GraphOps, MetricOps, QualityChecks}

/** Round-8 operator specs: WOE/IV against hand-computed tables,
  * average precision vs the closed-form step curve (tie-robustness,
  * degenerate all-negative groups), k-anonymity report invariants, and
  * local clustering coefficient on graphs with known closure structure.
  */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  // --------------------------------------------------------------- woeIv

  test("woeIv: hand-computed WOE and IV on a 2-level feature") {
    // level a: 3 pos, 1 neg; level b: 1 pos, 3 neg → pt=4, nt=4
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("a", 0),
      ("b", 1), ("b", 0), ("b", 0), ("b", 0)).toDF("f", "label")
    val out = MetricOps.woeIv(df, "f", "label").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b"))
    val a = out(0)
    assert(a.getLong(1) == 4 && a.getLong(2) == 3 && a.getLong(3) == 1)
    val woeA = math.log((3.5 / 4.0) / (1.5 / 4.0))
    val ivA = (3.0 / 4 - 1.0 / 4) * woeA
    assert(math.abs(a.getDouble(4) - woeA) < 1e-6)
    assert(math.abs(a.getDouble(5) - ivA) < 1e-6)
    // symmetric levels → iv_total = 2·ivA on every row
    assert(math.abs(a.getDouble(6) - 2 * ivA) < 1e-6)
    assert(math.abs(out(1).getDouble(4) + woeA) < 1e-6) // woe_b = −woe_a
  }

  test("woeIv: one-sided level stays finite via the 0.5 shift") {
    val df = Seq(("a", 1), ("a", 1), ("b", 0)).toDF("f", "label")
    val out = MetricOps.woeIv(df, "f", "label").collect()
    assert(out.forall(r => !r.isNullAt(4) &&
      !r.getDouble(4).isInfinite && !r.getDouble(4).isNaN))
  }

  // --------------------------------------------------- averagePrecision

  test("averagePrecision: perfect, inverted and tied rankers") {
    // perfect: positives hold the top scores → AP = 1
    val perfect = Seq((0L, 3.0, 1), (0L, 2.0, 1), (0L, 1.0, 0), (0L, 0.5, 0))
    // inverted: positives at the bottom → AP = Σ ΔR·P = .5·(1/3)+.5·(2/4)
    val inverted = Seq((1L, 3.0, 0), (1L, 2.0, 0), (1L, 1.0, 1), (1L, 0.5, 1))
    val out = MetricOps.averagePrecision(
        (perfect ++ inverted).toDF("g", "score", "label"),
        "g", "score", "label")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(math.abs(out(0L) - 1.0) < 1e-6)
    assert(math.abs(out(1L) - (0.5 / 3 + 0.5 * 2 / 4)) < 1e-6)
  }

  test("averagePrecision: ties form one step; all-negative group null") {
    // one score bucket holds 1 pos + 1 neg: AP = P at that step = 2/3... no:
    // steps: s=2 (1 pos of 2) → ΔR=1/2·? hand-compute:
    //   s=3: pos=1, cum=(1,1) → term (1/2)·(1/1)
    //   s=2: pos=1 tot=2, cum=(2,3) → term (1/2)·(2/3)
    val tied = Seq((0L, 3.0, 1), (0L, 2.0, 1), (0L, 2.0, 0))
    val neg = Seq((1L, 1.0, 0), (1L, 2.0, 0))
    val out = MetricOps.averagePrecision(
        (tied ++ neg).toDF("g", "score", "label"), "g", "score", "label")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(math.abs(out(0L).get - (0.5 + 0.5 * 2 / 3)) < 1e-6)
    assert(out(1L).isEmpty)
  }

  // ----------------------------------------------------------- kAnonymity

  test("kAnonymity: group sizes, risk share, l-diversity") {
    val df = Seq(
      ("us", "a", "x"), ("us", "a", "y"), ("us", "a", "x"), // size 3, l=2
      ("us", "b", "x"),                                     // size 1, l=1
      ("de", "a", "x"), ("de", "a", "x")                    // size 2, l=1
    ).toDF("country", "seg", "diag")
    val r = QualityChecks.kAnonymity(df, Seq("country", "seg"), "diag", 3)
      .collect().head
    assert(r.getLong(0) == 6 && r.getLong(1) == 3)  // n_rows, n_groups
    assert(r.getLong(2) == 1)                        // min size
    assert(r.getLong(3) == 2 && r.getLong(4) == 3)   // groups/rows < k
    assert(r.getLong(5) == 1)                        // min l-diversity
    assert(math.abs(r.getDouble(6) - 0.5) < 1e-9)    // 3 of 6 rows at risk
  }

  // ------------------------------------------------------ localClustering

  test("localClustering: triangle+pendant graph has known coefficients") {
    // K3 on {1,2,3} plus pendant edge 3–4
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val out = GraphOps.localClustering(edges, "a", "b").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 1L, 1.0)))
    assert(out(2L) == ((2L, 1L, 1.0)))
    assert(out(3L) == ((3L, 1L, 0.333333))) // 2·1/(3·2) at 6 dp
    assert(out(4L) == ((1L, 0L, -1.0))) // degree-1 → null coefficient
  }

  test("localClustering: K4 is fully clustered; sum T(v) = 3·triangles") {
    val k4 = (for { a <- 1 to 4; b <- (a + 1) to 4 } yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val out = GraphOps.localClustering(k4, "a", "b").collect()
    assert(out.length == 4)
    assert(out.forall(r => r.getDouble(3) == 1.0 && r.getLong(1) == 3))
    // K4 has 4 triangles; each of the 4 nodes sits in C(3,2)=3 of them
    assert(out.map(_.getLong(2)).sum == 12)
    // duplicate + reversed edges must not change anything
    val noisy = GraphOps.localClustering(
      k4.unionAll(k4.select(col("b").as("a"), col("a").as("b"))), "a", "b")
      .collect()
    assert(noisy.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq == out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  // ---------------------------------------------------- wilcoxonSignedRank

  test("wilcoxonSignedRank: hand W+, zero-diff drop, tie ranks") {
    // diffs 1, −2, 3, 4 → ranks 1..4, W+ = 1+3+4 = 8; plus one zero
    // pair that must drop from n
    val df = Seq((2.0, 1.0), (1.0, 3.0), (4.0, 1.0), (9.0, 5.0), (5.0, 5.0))
      .toDF("a", "b")
    val r = MetricOps.wilcoxonSignedRank(df, "a", "b").collect().head
    assert(r.getLong(0) == 4)
    assert(r.getDouble(1) == 8.0)
    val z = (8.0 - 5.0) / math.sqrt(4.0 * 5 * 9 / 24)
    assert(math.abs(r.getDouble(2) - z) < 1e-6)

    // tied |d|: 1, −1, 2 → avg rank 1.5 each, W+ = 1.5 + 3 = 4.5
    val tied = Seq((2.0, 1.0), (1.0, 2.0), (5.0, 3.0)).toDF("a", "b")
    val rt = MetricOps.wilcoxonSignedRank(tied, "a", "b").collect().head
    assert(rt.getLong(0) == 3 && rt.getDouble(1) == 4.5)
  }

  // ------------------------------------------------------- jackknifeRatio

  test("jackknifeRatio: two-group closed form") {
    // g1: 1/2, g2: 3/4 → θ = 4/6; θ₋1 = 3/4, θ₋2 = 1/2, θ̄ = 5/8
    val df = Seq(("g1", 1L, 1L), ("g1", 0L, 1L),
      ("g2", 1L, 1L), ("g2", 1L, 1L), ("g2", 1L, 1L), ("g2", 0L, 1L))
      .toDF("g", "num", "den")
    val r = MetricOps.jackknifeRatio(df, "g", "num", "den").collect().head
    assert(r.getLong(0) == 2)
    assert(math.abs(r.getDouble(1) - 4.0 / 6) < 1e-6)
    assert(math.abs(r.getDouble(2) - (2 * 4.0 / 6 - 0.625)) < 1e-6)
    assert(math.abs(r.getDouble(3) - 0.125) < 1e-6)
  }

  // ------------------------------------------------------- keySkewProfile

  test("keySkewProfile: percentiles and skew on a hot-key layout") {
    // 4 singleton keys + one 6-row hot key
    val rows = (Seq.fill(6)("hot") ++ Seq("a", "b", "c", "d")).toDF("k")
    val r = MetricOps.keySkewProfile(rows, "k").collect().head
    assert(r.getLong(0) == 10 && r.getLong(1) == 5 && r.getLong(2) == 6)
    assert(r.getLong(3) == 1 && r.getLong(4) == 6 && r.getLong(5) == 6)
    assert(r.getDouble(6) == 2.0)     // avg
    assert(r.getDouble(7) == 3.0)     // max/avg
    assert(r.getDouble(8) == 0.6)     // top1 share
  }

  // ---------------------------------------------------------- effectSizes

  test("effectSizes: hand Cliff's delta and Cohen's d") {
    // A = {1,2}, B = {1,3}: #(a>b)=1, #(a<b)=2 → δ = −1/4;
    // d = (1.5−2)/√((0.5+2)/2)
    val df = Seq((0, 1.0), (0, 2.0), (1, 1.0), (1, 3.0)).toDF("side", "v")
    val r = MetricOps.effectSizes(df, "v", "side", 0, 1).collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 1.5 && r.getDouble(3) == 2.0)
    assert(math.abs(r.getDouble(4) + 0.25) < 1e-9)
    assert(math.abs(r.getDouble(5) - (-0.5 / math.sqrt(1.25))) < 1e-6)
  }

  test("effectSizes: identical sides → delta 0, d null") {
    val df = Seq((0, 1.0), (0, 2.0), (1, 1.0), (1, 2.0)).toDF("side", "v")
    val r = MetricOps.effectSizes(df, "v", "side", 0, 1).collect().head
    assert(r.getDouble(4) == 0.0)
    assert(!r.isNullAt(5) && math.abs(r.getDouble(5)) < 1e-9)
    // degenerate: all values equal → pooled sd 0 → d null
    val const = Seq((0, 1.0), (0, 1.0), (1, 1.0)).toDF("side", "v")
    assert(MetricOps.effectSizes(const, "v", "side", 0, 1)
      .collect().head.isNullAt(5))
  }

  // -------------------------------------------------------------- mcnemar

  test("mcnemar: discordant-cell closed form; concordant-only null") {
    val df = Seq((1, 0), (1, 0), (1, 0), (0, 1), (1, 1), (1, 1))
      .toDF("a", "b")
    val r = MetricOps.mcnemar(df, "a", "b").collect().head
    assert(r.getLong(0) == 6 && r.getLong(1) == 3 && r.getLong(2) == 1)
    assert(r.getDouble(3) == 0.25) // (|3−1|−1)²/4
    assert(r.getDouble(4) == 1.0)  // 2/√4
    val conc = Seq((1, 1), (0, 0)).toDF("a", "b")
    val rc = MetricOps.mcnemar(conc, "a", "b").collect().head
    assert(rc.isNullAt(3) && rc.isNullAt(4))
  }

  // ---------------------------------------------------------- readability

  test("readability: vowel-run syllables, sentence floor") {
    val docs = Seq((1L, "the cat sat. it ran!"), (2L, "bcd"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextOps.readability(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val d1 = out(1L)
    assert(d1.getLong(1) == 5 && d1.getLong(2) == 2 && d1.getLong(3) == 5)
    assert(d1.getDouble(4) == 119.6975) // (206.835 − 1.015·2.5 − 84.6) at 4 dp
    // no vowels, no punctuation → sentence floor 1, zero syllables
    val d2 = out(2L)
    assert(d2.getLong(1) == 1 && d2.getLong(2) == 1 && d2.getLong(3) == 0)
  }

  // ------------------------------------------------------- recListMetrics

  test("recListMetrics: hand coverage/novelty/ILS on orthogonal vectors") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 0.0f)), (4L, Array(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    // lists: L1 = {1,2}, L2 = {2,3}; pop = (1:1, 2:2, 3:1), 4 recs
    val recs = Seq((10L, 1L), (10L, 2L), (20L, 2L), (20L, 3L))
      .toDF("lst", "item")
    val r = graft.operators.SimilarityOps.recListMetrics(
      recs, "lst", "item", emb, "vec_id", "embedding").collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 4)
    assert(r.getDouble(2) == 0.75) // 3 of 4 catalog items surfaced
    // novelty = (1·2 + 2·1 + 1·2)/4 bits
    assert(math.abs(r.getDouble(3) - 1.5) < 1e-9)
    // both in-list pairs are orthogonal → ILS 0
    assert(math.abs(r.getDouble(4)) < 1e-9)
  }

  // ----------------------------------------------------------- hilbertKey

  /** Reference xy→d walk (top-down quadrant, full-grid reflection). */
  private def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    val n1 = (1L << bits) - 1
    for (i <- bits - 1 to 0 by -1) {
      val s = 1L << i
      val rx = (x >> i) & 1; val ry = (y >> i) & 1
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { val nx = n1 - y; y = n1 - x; x = nx }
        else { val t = x; x = y; y = t }
      }
    }
    d
  }

  test("hilbertKey: matches reference walk; bijective; unit-step curve") {
    val grid = (for { x <- 0 until 16; y <- 0 until 16 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val out = graft.operators.LayoutOps.hilbertKey(grid, "x", "y", 4, "d")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // order-1 base quadrants land in the canonical 0-1-2-3 walk
    assert(out((0L, 0L)) < out((0L, 15L)))
    for (((x, y), d) <- out) assert(d == xy2d(4, x, y), s"($x,$y)")
    // bijective onto 0..255
    assert(out.values.toSet == (0L until 256L).toSet)
    // consecutive indices are grid-adjacent (the Hilbert property
    // Morton lacks)
    val byD = out.toSeq.sortBy(_._2).map(_._1)
    for (Seq((x1, y1), (x2, y2)) <- byD.sliding(2))
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"seam jump between d=${out((x1, y1))} and d=${out((x2, y2))}")
  }

  // ------------------------------------------------------ pruneSimulation

  test("pruneSimulation: clustered layout prunes, scattered layout doesn't") {
    val rows = (0L until 16L).toDF("y").withColumn("id", col("y"))
    val out = graft.operators.LayoutOps.pruneSimulation(rows,
        Seq("by_y" -> col("y"), "scatter" -> (col("y") * 7) % 16),
        "id", "y", lo = 0, hi = 3, nFiles = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("by_y") == ((4L, 1L, 0.75))) // one 4-row file covers 0..3
    // key 7y mod 16 ⇒ files hold y = {0,7,14,5}, {12,3,10,1},
    // {8,15,6,13}, {4,11,2,9}: only the third misses [0,3]
    assert(out("scatter") == ((4L, 3L, 0.25)))
  }

  // ------------------------------------------------------------- aggState

  test("aggState: merge of disjoint batches equals full recompute") {
    import graft.operators.RelationalOps
    val df = Seq(("a", 1.0), ("a", 2.5), ("a", -1.0), ("b", 4.0), ("b", 0.5))
      .toDF("k", "v")
    val full = RelationalOps.finalizeAggState(
      RelationalOps.aggState(df, "k", "v"), "k").collect()
    val merged = RelationalOps.finalizeAggState(
      RelationalOps.mergeAggStates(Seq(
        RelationalOps.aggState(df.filter(col("v") > 1), "k", "v"),
        RelationalOps.aggState(df.filter(col("v") <= 1), "k", "v"))),
      "k").collect()
    assert(merged.toSeq == full.toSeq)
    val a = full.find(_.getString(0) == "a").get
    assert(a.getLong(1) == 3 && a.getDouble(2) == 2.5 &&
      a.getDouble(3) == -1.0 && a.getDouble(4) == 2.5)
    assert(math.abs(a.getDouble(5) - 2.5 / 3) < 1e-6)
  }

  // ------------------------------------------------------------- bpePairs

  test("bpePairs: frequency-weighted adjacent char pairs over the vocab") {
    val docs = Seq((1L, "aa ab aa"), (2L, "abc x")).toDF("id", "text")
    val out = graft.operators.TextOps.bpePairs(docs, "text", 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "aa"×2 → pair aa:2; "ab"×1 + "abc"×1 → ab:2; "abc" → bc:1;
    // "x" is sub-pair-length and drops
    assert(out == Map("aa" -> 2L, "ab" -> 2L, "bc" -> 1L))
  }

  // ----------------------------------------------------- rendezvousAssign

  test("rendezvousAssign: deterministic argmax; minimal movement on grow") {
    import graft.operators.LayoutOps
    val keys = spark.range(200).toDF("k")
    val a4 = LayoutOps.rendezvousAssign(keys, "k", 4, "w4")
    // determinism across evaluations
    assert(a4.collect().sortBy(_.getLong(0)).toSeq ==
      LayoutOps.rendezvousAssign(keys, "k", 4, "w4")
        .collect().sortBy(_.getLong(0)).toSeq)
    // hand-check one key against the same md5 argmax
    val k0 = a4.filter(col("k") === 7L).collect().head.getLong(1)
    val exp = (0 until 4).maxBy(w =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"7:$w".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(k0 == exp)
    // growing 4 → 5 moves ~1/5 of keys (mod-hash would move ~4/5)
    val moved = a4
      .join(LayoutOps.rendezvousAssign(keys, "k", 5, "w5"), "k")
      .filter(col("w4") =!= col("w5")).count()
    assert(moved > 0 && moved < 80, s"moved $moved of 200")
  }

  // ------------------------------------------------------------ logOddsZ

  test("logOddsZ: hand-computed Dirichlet log-odds on a toy corpus") {
    import graft.operators.TextOps
    val docs = Seq((0, "a a b"), (1, "b c")).toDF("side", "text")
    val out = TextOps.logOddsZ(docs, "text", "side", alpha = 0.5, topK = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    // token a: ya=2, yb=0; na=3, nb=2, V=3
    val d = math.log(2.5 / (3 + 1.5 - 2 - 0.5)) -
      math.log(0.5 / (2 + 1.5 - 0 - 0.5))
    val z = d / math.sqrt(1 / 2.5 + 1 / 0.5)
    assert(out("a")._1 == 2 && out("a")._2 == 0)
    assert(math.abs(out("a")._3 - z) < 1e-6)
    // side-A words rank above side-B words
    assert(out("a")._3 > out("c")._3)
  }

  // ----------------------------------------------------------- goodTuring

  test("goodTuring: freq-of-freq, unseen mass, smoothed r*") {
    import graft.operators.TextOps
    val docs = Seq(("g", "x y y z z")).toDF("src", "text")
    val out = TextOps.goodTuring(docs, "src", "text", maxR = 5)
      .collect().map(r => r.getLong(1) -> r).toMap
    // r: x=1, y=2, z=2 → N1=1, N2=2; N=5 tokens → P0 = 0.2
    assert(out(1L).getLong(2) == 1 && out(2L).getLong(2) == 2)
    assert(out(1L).getDouble(4) == 0.2)
    assert(out(1L).getDouble(3) == 4.0) // r*=2·N2/N1
    assert(out(2L).isNullAt(3))         // no N3 → null r*
  }

  // ----------------------------------------------------------- dimProfile

  test("dimProfile: per-dimension moments on a 2×2 fixture") {
    val emb = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val out = graft.operators.SimilarityOps.dimProfile(emb, "embedding")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getLong(1) == 2 && out(0L).getDouble(2) == 2.0)
    assert(math.abs(out(0L).getDouble(3) - math.sqrt(2)) < 1e-6)
    assert(out(0L).getDouble(4) == 1.0 && out(0L).getDouble(5) == 3.0)
    assert(out(1L).getDouble(2) == 3.0)
  }

  // -------------------------------------------------------- retentionPlan

  test("retentionPlan: keep-last-N plus recency floor") {
    import graft.operators.RelationalOps
    val rows = (1 to 8).map(i => (1L, i.toLong, i.toLong))
      .toDF("k", "ts", "id")
    val r = RelationalOps.retentionPlan(rows, "k", "ts", "id",
      keepLast = 3, cutoff = lit(4L)).collect().head
    // rn > 3 keeps ts 6,7,8; cutoff keeps ts >= 4 → reclaim ts 1,2,3
    assert(r.getLong(0) == 8 && r.getLong(1) == 1)
    assert(r.getLong(2) == 3 && r.getLong(3) == 5)
    assert(r.getDouble(4) == 0.375)
  }

  // ------------------------------------------------------- compactionPlan

  test("compactionPlan: running-sum bins, overflow-by-one semantics") {
    import graft.operators.LayoutOps
    val files = Seq((1, 60L), (2, 60L), (3, 60L), (4, 100L), (5, 10L))
      .toDF("f", "b")
    val r = LayoutOps.compactionPlan(files, "f", "b", targetBytes = 100L)
      .collect().head
    // cum−b = 0,60,120,180,280 → bins 0,0,1,1,2 → {120,160,10}
    assert(r.getLong(0) == 5 && r.getLong(1) == 1) // only the 10-byte file is "small"
    assert(r.getLong(2) == 290 && r.getLong(3) == 3 && r.getLong(4) == 160)
    assert(math.abs(r.getDouble(5) - 290.0 / 300) < 1e-6)
  }

  // ----------------------------------------------------- watermarkAdvisor

  test("watermarkAdvisor: lateness percentiles vs arrival order") {
    import graft.operators.MetricOps
    val us = 1000000L
    val ev = Seq((1L, 10 * us), (2L, 5 * us), (3L, 20 * us),
      (4L, 15 * us), (5L, 25 * us))
      .toDF("arr", "tsu")
      .withColumn("ts", timestamp_micros(col("tsu")))
    val r = MetricOps.watermarkAdvisor(ev, "arr", "ts").collect().head
    // running max 10,10,20,20,25 → lateness 0,5,0,5,0 seconds
    assert(r.getLong(0) == 5)
    assert(r.getLong(1) == 0 && r.getLong(2) == 5 && r.getLong(3) == 5)
    assert(r.getLong(4) == 5 && r.getLong(5) == 5)
  }

  // ------------------------------------------------------------- seqRules

  test("seqRules: first-occurrence precedence with margins") {
    import graft.operators.RelationalOps
    val ev = Seq((1L, 1L, "a"), (1L, 2L, "b"),
      (2L, 1L, "a"), (2L, 3L, "b"), (2L, 2L, "c"),
      (3L, 1L, "b"))
      .toDF("u", "ts", "st")
    val out = RelationalOps.seqRules(ev, "u", "ts", "st").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(out(("a", "b"))._1 == 2)
    assert(math.abs(out(("a", "b"))._2 - 2.0 / 3) < 1e-6)
    assert(out(("a", "b"))._3 == 1.0)  // confidence: both a-users convert
    assert(out(("a", "b"))._4 == 1.0)  // lift: b covers every user
    assert(out(("a", "c")) == ((1L, 0.333333, 0.5, 1.5)))
    assert(out(("c", "b"))._1 == 1 && !out.contains(("b", "c")))
  }

  // ---------------------------------------------------------------- cuped

  test("cuped: hand-computed k, adjusted effect, variance reduction") {
    import graft.operators.ExperimentOps
    val df = Seq((0, 1.0, 1.0), (0, 2.0, 2.0), (1, 3.0, 4.0), (1, 4.0, 5.0))
      .toDF("arm", "x", "y")
    val r = ExperimentOps.cuped(df, "arm", "y", "x").collect().head
    // pooled: cov=1.75, vx=1.25 → k=1.4; raw=3; adj: 2.9 vs 3.1 → 0.2
    assert(r.getLong(0) == 2 && r.getLong(1) == 2)
    assert(math.abs(r.getDouble(2) - 1.4) < 1e-6)
    assert(math.abs(r.getDouble(3) - 3.0) < 1e-6)
    assert(math.abs(r.getDouble(4) - 0.2) < 1e-6)
    assert(math.abs(r.getDouble(5) - 0.98) < 1e-6) // ρ² = 3.0625/3.125
  }

  // ---------------------------------------------------------- srmAndPower

  test("srmAndPower: SRM chi2 and pooled-variance MDE") {
    import graft.operators.ExperimentOps
    val df = Seq((0, 0.0), (0, 1.0), (0, 1.0), (1, 1.0), (1, 1.0))
      .toDF("arm", "y")
    val r = ExperimentOps.srmAndPower(df, "arm", "y").collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 2)
    assert(math.abs(r.getDouble(2) - 0.2) < 1e-9)
    assert(math.abs(r.getDouble(3) -
      2.801585 * math.sqrt(0.2 * (1.0 / 3 + 1.0 / 2))) < 1e-6)
  }

  // ------------------------------------------------------------ conformal

  test("conformal: order-statistic qhat and held-out coverage") {
    import graft.operators.ExperimentOps
    val calib = (1 to 9).map(i => (0, i.toDouble, 0.0))
    val test = Seq((1, 5.0, 0.0), (1, 10.0, 0.0))
    val r = ExperimentOps.conformal((calib ++ test).toDF("sp", "y", "pred"),
      "sp", "y", "pred", level = 0.8).collect().head
    // k = ceil(0.8·10) = 8 → qhat = 8; test residuals 5 (in), 10 (out)
    assert(r.getLong(0) == 9 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 8.0)
    assert(r.getDouble(3) == 0.5)
  }

  // ------------------------------------------------------- offPolicyValue

  test("offPolicyValue: IPS/SNIPS/clipped with empirical propensities") {
    import graft.operators.ExperimentOps
    val logged = Seq(("a", 1), ("a", 0), ("b", 1), ("b", 0))
      .toDF("action", "reward")
    val r = ExperimentOps.offPolicyValue(logged, "action", "reward",
      targetAction = "a", clipAt = 1.5).collect().head
    // p(a)=1/2 → w=2 on a-rows: IPS = 2/4, SNIPS = 2/4, clipped 1.5/4
    assert(r.getLong(0) == 4)
    assert(r.getDouble(1) == 0.5 && r.getDouble(2) == 0.5)
    assert(r.getDouble(3) == 0.375)
  }

  // ------------------------------------------------------------------ ece

  test("ece: two-bin hand computation") {
    import graft.operators.ExperimentOps
    val df = Seq((0.1, 0), (0.1, 1), (0.9, 1), (0.9, 1))
      .toDF("pred", "label")
    val r = ExperimentOps.ece(df, "pred", "label", nBins = 2)
      .collect().head
    // bin0: conf .1 acc .5 gap .4; bin1: conf .9 acc 1 gap .1
    assert(r.getLong(0) == 4 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 0.25 && r.getDouble(3) == 0.4)
  }

  // --------------------------------------------------------------- liftCi

  test("liftCi: delta-method interval, hand-checked") {
    import graft.operators.ExperimentOps
    val df = Seq((0, 1.0), (0, 1.0), (0, 2.0), (1, 2.0), (1, 2.0), (1, 2.0))
      .toDF("arm", "y")
    val r = ExperimentOps.liftCi(df, "arm", "y").collect().head
    // m0=4/3, m1=2 → lift .5; v0=1/3, v1=0 → se = √(4·(1/3)/(3·(4/3)⁴))
    assert(r.getLong(0) == 3 && r.getLong(1) == 3)
    assert(math.abs(r.getDouble(4) - 0.5) < 1e-6)
    val se = math.sqrt(4.0 * (1.0 / 3) / (3 * math.pow(4.0 / 3, 4)))
    assert(math.abs(r.getDouble(5) - (0.5 - 1.959964 * se)) < 1e-5)
    assert(math.abs(r.getDouble(6) - (0.5 + 1.959964 * se)) < 1e-5)
  }

  // ------------------------------------------------------------ reconcile

  test("reconcile: per-parent value sums vs recorded totals") {
    import graft.operators.QualityChecks
    val parents = Seq((1L, 10.0), (2L, 20.0), (3L, 5.0)).toDF("k", "tot")
    val children = Seq((1L, 5.0), (1L, 5.0), (2L, 19.0)).toDF("k", "v")
    val r = QualityChecks.reconcile(parents, "k", "tot",
      children, "k", "v", tolerance = 0.05).collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 1) // order 3 childless
    assert(r.getLong(2) == 2)                       // rd 0 and 0.05 pass
    assert(math.abs(r.getDouble(3) - 0.025) < 1e-9)
    assert(r.getDouble(4) == 0.05)
  }

  // -------------------------------------------------------- volumeAnomaly

  test("volumeAnomaly: spike against the trailing baseline") {
    import graft.operators.MetricOps
    val us = 86400L * 1000000
    val rows = ((1 to 8).flatMap(d =>
      Seq.fill(if (d % 2 == 0) 12 else 10)(d)) ++ Seq.fill(30)(9))
      .map(d => ("g", d.toLong * us))
      .toDF("g", "tsu")
      .withColumn("ts", timestamp_micros(col("tsu")))
    val out = MetricOps.volumeAnomaly(rows, "g", "ts", window = 7,
      zCut = 2.0).collect()
    // alternating 10/12 days stay under |z| 2; only the day-9 spike
    // fires: baseline mean 78/7, sd √(48/42) → z ≈ 17.64
    assert(out.length == 1)
    val spike = out.head
    assert(spike.getLong(2) == 30 && spike.getString(1) == "1970-01-10")
    assert(math.abs(spike.getDouble(4) - 17.639242) < 1e-6)
  }

  // -------------------------------------------------------------- fdAudit

  test("fdAudit: holding and violated dependencies") {
    import graft.operators.QualityChecks
    val df = Seq((1, "x", "p"), (1, "x", "q"), (2, "y", "p"), (3, "y", "p"))
      .toDF("a", "b", "c")
    val out = QualityChecks.fdAudit(df, "t",
        Seq("a" -> "b", "a" -> "c", "b" -> "a"))
      .collect().map(r => (r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))))
      .toMap
    assert(out(("a", "b")) == ((3L, 3L, 0L, true)))  // a → b holds
    assert(out(("a", "c")) == ((3L, 4L, 1L, false))) // key 1 → {p,q}
    assert(out(("b", "a")) == ((2L, 3L, 1L, false))) // y → {2,3}
  }

  // ---------------------------------------------------- npmiCollocations

  test("npmiCollocations: hand npmi; minCount prunes; singles drop") {
    import graft.operators.TextOps
    val docs = Seq((1L, "x y x y"), (2L, "x y"), (3L, "z"))
      .toDF("id", "text")
    val out = TextOps.npmiCollocations(docs, "text", minCount = 2,
      topK = 10).collect()
    // bigrams: (x,y)×3, (y,x)×1 → only (x,y) survives; unigrams
    // x:3 y:3 z:1, T=7, B=4: pmi = ln((3/4)/((3/7)²))
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "x" && r.getString(1) == "y" &&
      r.getLong(2) == 3)
    val pmi = math.log((3.0 / 4) / ((3.0 / 7) * (3.0 / 7)))
    assert(math.abs(r.getDouble(3) - pmi) < 1e-6)
    assert(math.abs(r.getDouble(4) - pmi / -math.log(3.0 / 4)) < 1e-6)
  }
}
