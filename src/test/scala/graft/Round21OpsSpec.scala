package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, MixtureOps, SimilarityOps, TextOps}

/** Round-21 specs: snake-shard balance on a perfectly dealable size
  * ladder, the count-of-counts octaves, Moore–Lewis's add-one chain on
  * a two-doc corpus, silhouette hand geometry, the k-dist outlier
  * probe reach (including the zero-candidate spine row), the yield
  * funnel's four gates, and the pair-QA identical-twin row.
  */
class Round21OpsSpec extends SparkSpec {
  import spark.implicits._

  test("shardPlan: a 16..1 token ladder over 4 shards snake-deals to " +
    "perfect balance") {
    // doc i has 4*(17-i) chars -> 17-i tokens; snake over 4 shards
    // gives every shard 34 tokens (16+9+8+1 = 15+10+7+2 = ...)
    val df = (1 to 16).map(i => (i.toLong, "x" * (4 * (17 - i))))
      .toDF("doc_id", "text")
    val out = MixtureOps.shardPlan(df, "doc_id", "text", 4)
      .orderBy("shard").collect()
    assert(out.length == 4)
    for (r <- out) {
      assert(r.getAs[Long]("n_docs") == 4L)
      assert(r.getAs[Long]("tokens") == 34L)
      // (34*2e6 + 136) div 272 = 250000 (the 0.5 floors away)
      assert(r.getAs[Long]("share_ppm") == 250000L)
    }
  }

  test("freqSpectrum: counts land in bit-length octaves") {
    // a:3 -> bucket 1, b:1 and c:1 -> bucket 0 (hapax)
    val df = Seq(("s", "a a b"), ("s", "a c")).toDF("source", "text")
    val out = TextOps.freqSpectrum(df, "source", "text")
      .orderBy("bucket").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Int]("bucket") == 0 &&
      out(0).getAs[Long]("n_types") == 2L &&
      out(0).getAs[Long]("n_tokens") == 2L)
    assert(out(1).getAs[Int]("bucket") == 1 &&
      out(1).getAs[Long]("n_types") == 1L &&
      out(1).getAs[Long]("n_tokens") == 3L)
  }

  test("mooreLewis: hand add-one chain — in-domain doc scores " +
    "ln(4/3), out-domain ln(2/3)") {
    // in: "a b"; general adds "a c". V = {b,c} = 2.
    // doc0: ln((1+1)/(1+2)) - ln((1+1)/(2+2)) = ln(4/3) = 0.287682
    // doc1: ln((0+1)/(1+2)) - ln((1+1)/(2+2)) = ln(2/3) = -0.405465
    val df = Seq((0L, "a b", "in"), (1L, "a c", "out"))
      .toDF("doc_id", "text", "src")
    val out = TextOps.mooreLewis(df, "doc_id", "text",
      col("src") === "in").orderBy("doc_id").collect()
    assert(out(0).getAs[Double]("score") == 0.287682)
    assert(out(0).getAs[Long]("selected") == 1L)
    assert(out(1).getAs[Double]("score") == -0.405465)
    assert(out(1).getAs[Long]("selected") == 0L)
  }

  test("simplifiedSilhouette: two clusters 10 apart give the hand " +
    "(b-a)/max(a,b) values") {
    // l0: (0,0),(2,0) centroid (1,0); l1: (10,0),(12,0) centroid (11,0)
    // outer members: s = 10/11; inner members: s = 8/9
    val df = Seq(
      (1L, Array(0.0f, 0.0f), 0), (2L, Array(2.0f, 0.0f), 0),
      (3L, Array(10.0f, 0.0f), 1), (4L, Array(12.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.simplifiedSilhouette(df, "vec_id",
      "embedding", "label").orderBy("label").collect()
    assert(out.length == 2)
    for (r <- out) {
      assert(r.getAs[Long]("n_vecs") == 2L)
      assert(r.getAs[Double]("min_sil") == 0.888889) // 8/9
      assert(r.getAs[Double]("max_sil") == 0.909091) // 10/11
      assert(r.getAs[Double]("mean_sil") == 0.89899)
    }
  }

  test("simplifiedSilhouette: a single-label corpus scores 0 (no " +
    "other centroid), not null") {
    val df = Seq((1L, Array(1.0f, 0.0f), 7), (2L, Array(3.0f, 0.0f), 7))
      .toDF("vec_id", "embedding", "label")
    val r = SimilarityOps.simplifiedSilhouette(df, "vec_id",
      "embedding", "label").collect()(0)
    assert(r.getAs[Double]("mean_sil") == 0.0)
    assert(java.lang.Double.doubleToRawLongBits(
      r.getAs[Double]("mean_sil")) == 0L)
  }

  test("knnDistOutlier: multi-probe reach finds the Hamming-1 " +
    "neighbor; a probe-isolated vector flags with zero candidates") {
    // a,b in bucket 15; c in 14 (reachable from 15 by one bit-flip);
    // d in bucket 1 — no probe of any vector reaches it.
    val df = Seq(
      (1L, Array(1.0f, 1.0f, 1.0f, 1.0f)),   // a
      (2L, Array(1.0f, 1.0f, 1.0f, 0.9f)),   // b
      (3L, Array(-1.0f, 1.0f, 1.0f, 1.0f)),  // c
      (4L, Array(1.0f, -1.0f, -1.0f, -1.0f)) // d
    ).toDF("vec_id", "embedding")
    val out = SimilarityOps.knnDistOutlier(df, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Long]("n_cand") == 2L)
    // a's farthest candidate is c: cos = 2/(2*2) = 0.5 exactly
    assert(byId(1L).getAs[Double]("kth_dist") == 0.5)
    assert(byId(2L).getAs[Long]("n_cand") == 2L)
    assert(byId(2L).getAs[Double]("kth_dist") > 0.5, "cos(b,c) < 0.5")
    assert(byId(3L).getAs[Long]("n_cand") == 2L)
    assert(byId(4L).getAs[Long]("n_cand") == 0L)
    assert(byId(4L).isNullAt(byId(4L).fieldIndex("kth_dist")))
    // all four: fewer than k=5 candidates -> flagged
    assert(out.forall(_.getAs[Long]("is_outlier") == 1L))
  }

  test("yieldFunnel: the four gates drop the right docs and tokens") {
    val good = ("the" +: (1 to 29).map(i => f"w$i%03d")).mkString(" ")
    val df = Seq(
      (1L, good, "en", "A"),     // survives everything
      (2L, good, "en", "A"),     // duplicate: dies at dedup
      (3L, "x y z", "zh", "A"),  // dies at the lang gate
      (4L, "a b c", "en", "B")   // dies at the quality gate (n < 30)
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextOps.yieldFunnel(df, "source", "doc_id", "text",
        "lang", Seq("en", "de", "es"), Seq("the", "a"))
      .orderBy("source").collect()
    val a = out(0); val b = out(1)
    assert(a.getAs[Long]("n_raw") == 3L && a.getAs[Long]("tok_raw") == 63L)
    assert(a.getAs[Long]("n_lang") == 2L && a.getAs[Long]("tok_lang") == 60L)
    assert(a.getAs[Long]("n_quality") == 2L)
    assert(a.getAs[Long]("n_dedup") == 1L &&
      a.getAs[Long]("tok_dedup") == 30L)
    assert(b.getAs[Long]("n_raw") == 1L)
    assert(b.getAs[Long]("n_lang") == 1L)
    assert(b.getAs[Long]("n_quality") == 0L && b.getAs[Long]("n_dedup") == 0L)
  }

  test("pairQaReport: an identical twin pair lands in decile 9 with " +
    "unit ratios") {
    val t = "alpha beta gamma delta epsilon"
    val df = Seq((1L, t), (2L, t),
      (3L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val out = DedupOps.pairQaReport(
      DedupOps.shingles(df, "doc_id", "text"), "doc_id").collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Int]("decile") == 9)
    assert(r.getAs[Long]("n_pairs") == 1L)
    assert(r.getAs[Double]("mean_jaccard") == 1.0)
    assert(r.getAs[Double]("mean_containment") == 1.0)
    assert(r.getAs[Double]("mean_size_ratio") == 1.0)
  }
}
