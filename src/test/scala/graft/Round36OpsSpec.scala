package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, TextOps}

/** Round-36 specs: tokenizer application (merge-sequence rewrite +
  * compression census), the cross-method dedup agreement census, and
  * the flagship leave-one-out eval contract.
  */
class Round36OpsSpec extends SparkSpec {
  import spark.implicits._

  test("phraseApply: the trained merge sequence rewrites in training " +
    "order; compression ppm is exact half-up") {
    // merges: round 1 (x, y, 2) -> round 2 (x@y, z, 2): the second
    // round merges the FIRST round's output, so application must nest
    // the replaces in training order.
    val df = Seq((1L, "x y z"), (2L, "x y z"), (3L, "w w"))
      .toDF("doc_id", "text").withColumn("source", lit("s0"))
    val out = TextOps.phraseApply(df, "source", "text", steps = 2)
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("tokens_before"), r.getAs[Long]("tokens_after"),
        r.getAs[Long]("merged_occ"), r.getAs[Long]("compression_ppm")))
    // before: 3 + 3 + 2 = 8; round 1 merges (x,y) [2 occ], round 2
    // merges (x@y,z) [2 occ] -> "x@y@z" (1 token), "w w" -> round 3
    // would pick (w,w) but steps=2 stops; after: 1 + 1 + 2 = 4.
    // compression = (4*2e6 + 8) div 16 = 500000 (exactly 1/2).
    assert(out.toSeq == Seq(("s0", 8L, 4L, 4L, 500000L)))
  }

  test("phraseApply: half-up compression rounding and multi-source split") {
    val df = Seq(("a", "p q p q"), ("b", "u v w"))
      .toDF("source", "text")
    val out = TextOps.phraseApply(df, "source", "text", steps = 1)
      .orderBy("source")
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("tokens_after"), r.getAs[Long]("compression_ppm")))
    // single merge (p,q): greedy non-overlapping replace consumes the
    // trailing space of each match (the q419 word2phrase semantics),
    // so " p q p q " rewrites only the FIRST occurrence -> "p@q p q"
    // (3 tokens of 4, compression (3*2e6+4) div 8 = 750000 half-up);
    // "u v w" untouched (3 of 3) -> 1000000 exactly.
    assert(out.toSeq == Seq(("a", 3L, 750000L), ("b", 3L, 1000000L)))
  }

  test("dedupMethodCensus: identical long docs land in all three " +
    "detectors; identical SHORT docs are exact+simhash only (no shingles)") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (3L, "zz"),
      (4L, "zz"),                                  // exact dup of 3, <3 tokens
      (5L, "totally unrelated content words here"))
      .toDF("doc_id", "text")
    val out = DedupOps.dedupMethodCensus(df, "doc_id", "text")
      .collect().map(r => ((r.getAs[Long]("exact_dup"),
        r.getAs[Long]("minhash_j05"), r.getAs[Long]("simhash_h3")),
        r.getAs[Long]("n_pairs"))).toMap
    assert(out((1L, 1L, 1L)) == 1L)  // pair (1,2): all three agree
    assert(out((1L, 0L, 1L)) == 1L)  // pair (3,4): no shingles -> no LSH
    // every exact pair is accounted for exactly once
    assert(out.filter(_._1._1 == 1L).values.sum == 2L)
  }

  test("annTopKAdaptive: the width schedule steps at 1000 vectors and " +
    "matches the fixed-width op at each step") {
    import graft.operators.SimilarityOps
    val dir = "/root/testdata/sf0.1" // 2000 vectors -> 6 bits
    val emb = graft.tables.Tables.embeddings(spark, dir)
    val small = emb.limit(500)       // below the step -> 4 bits
    assert(SimilarityOps.annTopKAdaptive(small, "vec_id", "embedding", 3)
      .orderBy("vec_id", "neighbor_id").collect().toSeq ==
      SimilarityOps.annTopKMultiProbe(small, "vec_id", "embedding", 3, 4)
        .orderBy("vec_id", "neighbor_id").collect().toSeq)
    assert(SimilarityOps.annTopKAdaptive(emb, "vec_id", "embedding", 3)
      .orderBy("vec_id", "neighbor_id").collect().toSeq ==
      SimilarityOps.annTopKMultiProbe(emb, "vec_id", "embedding", 3, 6)
        .orderBy("vec_id", "neighbor_id").collect().toSeq)
    // per-4x steps above the gate SFs: cells grow with n so the average
    // cell stays ~16 vectors (the round-10 scale-probe fix); cap 16 bits
    def bitsOf(n: Long): Int =
      SimilarityOps.adaptiveSignBits(spark.range(n).toDF("x"))
    assert(Seq(999L -> 4, 1000L -> 6, 3999L -> 6, 4000L -> 8,
      16000L -> 10, 20000L -> 10, 64000L -> 12, 256000L -> 14,
      1024000L -> 16, 5000000L -> 16).forall { case (n, b) => bitsOf(n) == b })
  }

  test("recommendFrom over the full log equals recommend; LOO eval " +
    "metrics stay in [0, 1e6]") {
    val dir = "/root/testdata/sf0.001"
    val full = Flagship.recommend(spark, dir)
    val via = Flagship.recommendFrom(spark,
      graft.tables.Tables.events(spark, dir),
      graft.tables.Tables.embeddings(spark, dir))
    assert(full.collect().toSeq == via.collect().toSeq)
    val eval = SparkEntry.queries("q435_flagship_loo_eval")(spark, dir)
      .collect()
    assert(eval.length == 1)
    val r = eval(0)
    assert(r.getAs[Long]("n_users") > 0)
    assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_users"))
    val hr = r.getAs[Long]("hit_rate_ppm")
    val mrr = r.getAs[Long]("mrr_ppm")
    assert(hr >= 0 && hr <= 1000000 && mrr >= 0 && mrr <= hr,
      s"mrr ($mrr) must not exceed hit rate ($hr) for a top-3 list")
  }
}
