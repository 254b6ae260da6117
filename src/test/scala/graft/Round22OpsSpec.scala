package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, MixtureOps, TextOps}

/** Round-22 specs: duplicate-flow pair counting on both granularities,
  * CDC chunk boundaries (md5-'0' cut tokens), the rank-blend ppm
  * arithmetic with ties, the BPE pair table, the mixture-correction
  * feasibility point, and the KL-novelty hand chain.
  */
class Round22OpsSpec extends SparkSpec {
  import spark.implicits._

  private def r12(v: Double): Double =
    BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("dupFlowMatrix (doc granularity): diagonal counts c(c-1)/2, " +
    "off-diagonal ca*cb; singleton hashes never join") {
    val df = Seq(
      (1L, "t one", "A"), (2L, "t one", "A"),  // within-A dup pair
      (3L, "t two", "A"),                      // unique: excluded
      (4L, "t one", "B")                       // syndicated copy in B
    ).toDF("doc_id", "text", "source")
    val out = DedupOps.dupFlowMatrix(df, "source", "text")
      .orderBy("source_a", "source_b").collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "A" && out(0).getString(1) == "A" &&
      out(0).getAs[Long]("n_groups") == 1L &&
      out(0).getAs[Long]("n_unit_pairs") == 1L)
    assert(out(1).getString(0) == "A" && out(1).getString(1) == "B" &&
      out(1).getAs[Long]("n_groups") == 1L &&
      out(1).getAs[Long]("n_unit_pairs") == 2L)
  }

  test("dupFlowMatrix (chunk granularity): a shared leading chunk " +
    "links two sources whose documents differ") {
    val df = Seq(
      (1L, "a b c", "A"),   // chunks (size 2): "a b" | "c"
      (2L, "a b d", "B")    // chunks: "a b" | "d"
    ).toDF("doc_id", "text", "source")
    val out = DedupOps.dupFlowMatrix(df, "source", "text", 2)
      .collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "A" && out(0).getString(1) == "B")
    assert(out(0).getAs[Long]("n_groups") == 1L)
    assert(out(0).getAs[Long]("n_unit_pairs") == 1L)
  }

  test("cdcChunks: a boundary falls AFTER the md5-'0' token; shared " +
    "chunks flag as duplicates on both sides") {
    // md5('a') starts with '0' (boundary token); b/c/d/x/y do not
    val df = Seq(
      (1L, "b a c d"),  // chunks: "b a" | "c d"
      (2L, "x y"),      // one chunk, unique
      (3L, "c d")       // one chunk, equal to doc 1's second
    ).toDF("doc_id", "text")
    val out = TextOps.cdcChunks(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Long]("n_chunks") == 2L)
    assert(byId(1L).getAs[Double]("mean_chunk_tokens") == 2.0)
    assert(byId(1L).getAs[Long]("n_dup_chunks") == 1L)
    assert(byId(1L).getAs[Double]("dup_chunk_rate") == 0.5)
    assert(byId(2L).getAs[Long]("n_chunks") == 1L)
    assert(byId(2L).getAs[Long]("n_dup_chunks") == 0L)
    assert(byId(3L).getAs[Long]("n_chunks") == 1L)
    assert(byId(3L).getAs[Long]("n_dup_chunks") == 1L)
    assert(byId(3L).getAs[Double]("dup_chunk_rate") == 1.0)
  }

  test("rankBlend: exact ppm percentiles with doc-id tie-breaks; " +
    "only the all-top doc clears the quartile cut") {
    val df = Seq(
      (1L, "the a the a"),        // n=4, dr=.5, sr=1.0
      (2L, "x y z w v"),          // n=5, dr=1,  sr=0
      (3L, "p p p"),              // n=3, dr=1/3, sr=0 (tie with 2,4)
      (4L, "m n o q r s t u")     // n=8, dr=1 (tie with 2), sr=0
    ).toDF("doc_id", "text")
    val out = TextOps.rankBlend(df, "doc_id", "text", Seq("the", "a"))
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // len ranks asc: 3,1,2,4 -> pct 500000,750000,250000,1000000
    assert(byId(1L).getAs[Long]("pct_len") == 500000L)
    assert(byId(2L).getAs[Long]("pct_len") == 750000L)
    assert(byId(3L).getAs[Long]("pct_len") == 250000L)
    assert(byId(4L).getAs[Long]("pct_len") == 1000000L)
    // dr: d3 < d1 < d2 = d4 (tie by id)
    assert(byId(2L).getAs[Long]("pct_distinct") == 750000L)
    assert(byId(4L).getAs[Long]("pct_distinct") == 1000000L)
    // stopword rate desc-ranked: d1 (worst) first
    assert(byId(1L).getAs[Long]("pct_stop") == 250000L)
    assert(byId(4L).getAs[Long]("pct_stop") == 1000000L)
    // blend: (sum*2+3) div 6; only doc 4 (1e6 everywhere) selected
    assert(byId(4L).getAs[Long]("blend_ppm") == 1000000L)
    assert(byId(4L).getAs[Long]("selected") == 1L)
    assert(byId(1L).getAs[Long]("blend_ppm") == 416667L)
    assert(out.map(_.getAs[Long]("selected")).sum == 1L)
  }

  test("bpeMergeStats: adjacent char pairs count and share exactly") {
    val df = Seq((1L, "aba ab")).toDF("doc_id", "text")
    val out = TextOps.bpeMergeStats(df, "text").collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "ab" &&
      out(0).getAs[Long]("n_occ") == 2L &&
      out(0).getAs[Long]("share_ppm") == 666667L)
    assert(out(1).getString(0) == "ba" &&
      out(1).getAs[Long]("n_occ") == 1L &&
      out(1).getAs[Long]("share_ppm") == 333333L)
  }

  test("mixtureCorrection: the binding source gets rate 1.0; the " +
    "other is down-sampled to the feasible budget") {
    val df = Seq(
      ("A", "a b c d"), ("A", "a b c d"), ("A", "e f"),
      ("B", "x y z")
    ).toDF("src", "text")
    val out = MixtureOps.mixtureCorrection(df, "src", "text")
      .orderBy("source").collect()
    val a = out(0); val b = out(1)
    assert(a.getAs[Long]("tokens_raw") == 10L)
    assert(a.getAs[Long]("tokens_dedup") == 6L)
    assert(b.getAs[Long]("tokens_raw") == 3L)
    assert(b.getAs[Long]("tokens_dedup") == 3L)
    val wA = r6(math.sqrt(10.0)); val wB = r6(math.sqrt(3.0))
    assert(a.getAs[Double]("weight") == wA)
    val budget = math.min(6.0 / wA, 3.0 / wB)
    assert(b.getAs[Double]("rate") == 1.0, "B binds the budget")
    assert(a.getAs[Double]("rate") == r6(wA * budget / 6.0))
    assert(a.getAs[Long]("alloc_tokens") ==
      math.floor(wA * budget).toLong)
    assert(b.getAs[Long]("alloc_tokens") ==
      math.floor(wB * budget).toLong)
  }

  test("klNovelty: the two-doc hand chain reproduces the 12-dp term " +
    "sums") {
    // corpus: "a a b" + "a c"; N=5, c(a)=3, c(b)=1, c(c)=1
    val df = Seq((0L, "a a b"), (1L, "a c")).toDF("doc_id", "text")
    val out = TextOps.klNovelty(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val kl0 = r6(r12((2.0 / 3) * math.log(2.0 * 5 / (3.0 * 3))) +
      r12((1.0 / 3) * math.log(1.0 * 5 / (3.0 * 1))))
    val kl1 = r6(r12((1.0 / 2) * math.log(1.0 * 5 / (2.0 * 3))) +
      r12((1.0 / 2) * math.log(1.0 * 5 / (2.0 * 1))))
    assert(out(0).getAs[Long]("n_tokens") == 3L)
    assert(out(0).getAs[Double]("kl") == kl0)
    assert(out(1).getAs[Long]("n_tokens") == 2L)
    assert(out(1).getAs[Double]("kl") == kl1)
    assert(kl0 > 0 && kl1 > 0, "KL against the corpus mix is positive")
  }
}
