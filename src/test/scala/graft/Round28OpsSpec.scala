package graft

import org.apache.spark.sql.functions._
import graft.operators.{GraphOps, SimilarityOps, TextOps}

/** Round-28 specs: pack contamination window arithmetic, char-bigram
  * conditional entropy on a pinned string, transitivity on a
  * triangle+pendant graph, cross-language near-dup wiring, SRP
  * fidelity on exactly-representable pairs, and the ANN recall audit
  * on a hand-placed quantizer-miss.
  */
class Round28OpsSpec extends SparkSpec {
  import spark.implicits._

  test("packContamination: per-shard greedy windows count mixed " +
    "sources per budget") {
    // nShards=2 → shard0 = ids {0,2}, shard1 = {1,3}
    val df = Seq(
      (0L, "a b", "A"), (1L, "c", "B"),
      (2L, "d d d", "B"), (3L, "e", "A")
    ).toDF("doc_id", "text", "source")
    val out = TextOps.packContamination(df, "doc_id", "text", "source",
        Seq(1L, 3L), nShards = 2)
      .orderBy("budget").collect()
    // budget 1: every doc opens its own bin (before div 1 ≥ 1 apart
    // except the shard-first rows) → shard0 bins {0, 2}, shard1 {0, 1}
    val b1 = out(0)
    assert(b1.getAs[Long]("budget") == 1L)
    assert(b1.getAs[Long]("n_windows") == 4L)
    assert(b1.getAs[Long]("n_mixed") == 0L)
    assert(b1.getAs[Long]("mixed_ppm") == 0L)
    assert(b1.getAs[Double]("mean_sources") == 1.0)
    // budget 3: one window per shard, each mixing both sources
    val b3 = out(1)
    assert(b3.getAs[Long]("budget") == 3L)
    assert(b3.getAs[Long]("n_windows") == 2L)
    assert(b3.getAs[Long]("n_docs") == 4L)
    assert(b3.getAs[Long]("n_mixed") == 2L)
    assert(b3.getAs[Long]("mixed_ppm") == 1000000L)
    assert(b3.getAs[Double]("mean_sources") == 2.0)
  }

  test("charCompressibility: H(c2|c1) on 'aabb' is exactly 2/3 bit") {
    // bigrams aa/ab/bb once each (sj = 0); first-char marginals a:2 b:1
    // (sm = 2·ln2) → cond = 2ln2/(3·ln2) = 0.666667 bits/char
    val df = Seq(("S", "aabb")).toDF("source", "text")
    val r = TextOps.charCompressibility(df, "source", "text").collect()(0)
    assert(r.getAs[Long]("n_bigrams") == 3L)
    assert(r.getAs[Long]("n_distinct_bigrams") == 3L)
    assert(r.getAs[Double]("cond_bits") == 0.666667)
    assert(r.getAs[Double]("compress_ratio") == 0.083333)
  }

  test("transitivity: triangle + pendant edge → 3·1/5 paths closed") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
      .toDF("a", "b")
    val r = GraphOps.transitivity(edges, "a", "b").collect()(0)
    assert(r.getAs[Long]("n_nodes") == 4L)
    assert(r.getAs[Long]("n_edges") == 4L)
    // deg 2,2,3,1 → Σ d(d−1)/2 = 1+1+3+0 = 5; one triangle
    assert(r.getAs[Long]("n_paths2") == 5L)
    assert(r.getAs[Long]("n_triangles") == 1L)
    assert(r.getAs[Long]("transitivity_ppm") == 600000L)
  }

  test("crossLangNearDup: an identical pair across languages lands " +
    "in one cross row; the anti-parallel vector stays out") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Seq(-1.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val docs = Seq((1L, "en"), (2L, "fr"), (3L, "en"))
      .toDF("doc_id", "lang")
    val out = SimilarityOps.crossLangNearDup(emb, "vec_id", "embedding",
      docs, "doc_id", "lang", 0.5, 4).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[String]("lang_lo") == "en")
    assert(r.getAs[String]("lang_hi") == "fr")
    assert(r.getAs[Int]("is_cross") == 1)
    assert(r.getAs[Long]("n_pairs") == 1L)
    assert(r.getAs[Double]("mean_sim") == 1.0)
  }

  test("srpFidelity: axis-aligned ± pairs estimate exactly (h = 0 or " +
    "w) → zero MAE and bias at every width") {
    // ±e1: projections flip sign with the vector, so Hamming is 0
    // (same) or w (opposite) and cos(π·h/w) = ±1 = the exact cosine
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Seq(-1.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = SimilarityOps.srpFidelity(emb, "vec_id", "embedding",
        widths = Seq(2, 4), inDim = 4)
      .orderBy("width").collect()
    assert(out.length == 2)
    for (r <- out) {
      assert(r.getAs[Long]("n_pairs") == 3L)
      assert(r.getAs[Double]("mae") == 0.0)
      assert(r.getAs[Double]("bias") == 0.0)
    }
  }

  test("annRecallAudit: a neighbor one sign-bit away is missed at " +
    "probe level 0 and recovered at level 1") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),    // query, bucket 1
      (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),    // bucket 3 (H1 from 1)
      (2L, Seq(1.0f, -0.1f, 0.0f, 0.0f)),   // bucket 1
      (3L, Seq(-1.0f, 0.0f, 0.0f, 0.0f))    // bucket 0 (H1), sim −1
    ).toDF("vec_id", "embedding")
    val out = SimilarityOps.annRecallAudit(emb, "vec_id", "embedding",
        k = 2, signBits = 4, sampleMod = 20)
      .orderBy("level").collect()
      .map(r => (r.getAs[Long]("level"), r.getAs[Long]("n_queries"),
        r.getAs[Long]("n_hits"), r.getAs[Long]("recall_ppm")))
    // exact top-2 of v0 = {v2 (0.995), v1 (0.994)}; own-cell sees
    // only v2; the H1 probe reaches v1's cell
    assert(out.toSeq == Seq((0L, 1L, 1L, 500000L),
      (1L, 1L, 2L, 1000000L), (2L, 1L, 2L, 1000000L)))
  }
}
