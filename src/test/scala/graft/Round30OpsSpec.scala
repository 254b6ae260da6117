package graft

import graft.operators.{DedupOps, SimilarityOps, TextOps}

/** Round-30 specs: quantized-index ranking agreement on exactly-
  * representable vectors, incremental dedup hit-rate arithmetic,
  * dup-chunk position deciles, Bloom dedup-cost consistency, LSH
  * candidate precision at full band agreement, and the two-scheme
  * chunk census on identical documents.
  */
class Round30OpsSpec extends SparkSpec {
  import spark.implicits._

  test("quantRecall: exactly-representable vectors keep the full " +
    "top-1 at both levels") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Seq(-1.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = SimilarityOps.quantRecall(emb, "vec_id", "embedding",
        k = 1, levels = Seq(15, 255))
      .orderBy("level").collect()
    assert(out.length == 2)
    for (r <- out) {
      assert(r.getAs[Long]("n_top") == 3L)
      assert(r.getAs[Long]("n_hits") == 3L)
      assert(r.getAs[Long]("agree_ppm") == 1000000L)
    }
  }

  test("incrementalDedupRate: per-source hit rate and tokens dropped") {
    val old = Seq((1L, "s", "a b"), (2L, "s", "c d"))
      .toDF("doc_id", "source", "text")
    val nw = Seq((3L, "s", "a b"), (4L, "s", "x y"), (5L, "t", "c d"))
      .toDF("doc_id", "source", "text")
    val out = DedupOps.incrementalDedupRate(old, nw, "source", "text")
      .orderBy("source").collect()
    val s = out(0)
    assert(s.getAs[String]("source") == "s")
    assert(s.getAs[Long]("n_new") == 2L)
    assert(s.getAs[Long]("n_hit") == 1L)
    assert(s.getAs[Long]("hit_ppm") == 500000L)
    assert(s.getAs[Long]("tokens_dropped") == 2L)
    val t = out(1)
    assert(t.getAs[Long]("n_hit") == 1L &&
      t.getAs[Long]("hit_ppm") == 1000000L &&
      t.getAs[Long]("tokens_dropped") == 2L)
  }

  test("dupPositionProfile: a leading shared chunk lands its dup mass " +
    "in decile 0") {
    val df = Seq(
      (1L, "a b c d e f"),   // chunks (w=2): a b | c d | e f
      (2L, "a b")            // single chunk, duplicates doc1's head
    ).toDF("doc_id", "text")
    val out = DedupOps.dupPositionProfile(df, "doc_id", "text", w = 2)
      .orderBy("pos_decile").collect()
      .map(r => (r.getAs[Long]("pos_decile"), r.getAs[Long]("n_chunks"),
        r.getAs[Long]("n_dup"), r.getAs[Long]("dup_ppm")))
    assert(out.toSeq == Seq((0L, 2L, 2L, 1000000L),
      (3L, 1L, 0L, 0L), (6L, 1L, 0L, 0L)))
  }

  test("bloomDedupCost: members always probe positive; false " +
    "positives only among true uniques") {
    val old = Seq((1L, "s", "a b")).toDF("doc_id", "source", "text")
    val nw = Seq((2L, "s", "a b"), (3L, "s", "x y"))
      .toDF("doc_id", "source", "text")
    val r = DedupOps.bloomDedupCost(old, nw, "source", "text")
      .collect()(0)
    assert(r.getAs[Long]("n_probed") == 2L)
    assert(r.getAs[Long]("n_member") == 1L)
    val pos = r.getAs[Long]("n_bloom_pos")
    assert(pos >= 1L && pos <= 2L)
    assert(r.getAs[Long]("n_false_pos") == pos - 1L)
    assert(r.getAs[Long]("fp_ppm") == (pos - 1L) * 1000000L)
  }

  test("candidatePrecision: identical docs agree on all bands and " +
    "verify at Jaccard 1") {
    val df = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "p q r s t")
    ).toDF("doc_id", "text")
    val out = DedupOps.candidatePrecision(df, "doc_id", "text")
      .collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("n_bands") == 4L)
    assert(r.getAs[Long]("n_cands") == 1L)
    assert(r.getAs[Long]("n_verified") == 1L)
    assert(r.getAs[Long]("precision_ppm") == 1000000L)
    assert(r.getAs[Double]("mean_jaccard") == 1.0)
  }

  test("chunkSchemeCensus: identical docs duplicate every chunk under " +
    "BOTH schemes; fixed counts are exact") {
    val df = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "x y z")
    ).toDF("doc_id", "text")
    val out = TextOps.chunkSchemeCensus(df, "doc_id", "text", w = 2)
      .orderBy("scheme").collect()
    assert(out.length == 2)
    val cdc = out(0)
    assert(cdc.getAs[String]("scheme") == "cdc")
    assert(cdc.getAs[Long]("n_docs_touched") == 2L)
    assert(cdc.getAs[Long]("max_family") == 2L)
    assert(cdc.getAs[Long]("n_dup_chunks") ==
      2L * cdc.getAs[Long]("n_families"))
    val fx = out(1)
    // doc1/doc2 (w=2): chunks "a b" and "c" — two families of 2
    assert(fx.getAs[String]("scheme") == "fixed")
    assert(fx.getAs[Long]("n_families") == 2L)
    assert(fx.getAs[Long]("n_dup_chunks") == 4L)
    assert(fx.getAs[Long]("n_docs_touched") == 2L)
    assert(fx.getAs[Long]("n_verify_pairs") == 2L)
    assert(fx.getAs[Long]("max_family") == 2L)
  }
}
