package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, MixtureOps, SimilarityOps, TextOps}

/** Round-20 specs: the held-out trigram backoff chain (all three
  * branches hit by construction), SemDeDup's keep-the-farthest rule,
  * the Davies–Bouldin hand geometry, the epoch-capped mixture's
  * cap + one-round redistribution arithmetic, exact fertility ratios,
  * contamination runs (gaps-and-islands), and CCNet tercile assignment.
  */
class Round20OpsSpec extends SparkSpec {
  import spark.implicits._

  test("trigramBackoffXent: seen / pair-backoff / unigram-floor " +
    "branches score the hand values; the all-seen doc is +0.0") {
    // train half = even doc_ids = doc 0 only: "a b c d"
    //   c3 {(a,b,c):1,(b,c,d):1}; n3 {(a,b):1,(b,c):1}
    //   c2 {(b,c):1,(c,d):1};     n2 {b:1,c:1}; c1 {c:1,d:1}
    //   nn=2 trigram positions, vv=2 distinct w3
    val df = Seq(
      (0L, "a b c d"),  // train; scores itself: both trigrams seen
      (1L, "a b c"),    // seen trigram -> s=1 -> ln 1 = 0 -> xent +0.0
      (3L, "x b c"),    // backoff to (b,c): s = 0.4*1/1
      (5L, "x y z")     // unseen everywhere: s = 0.16*(0+1)/(2+2)
    ).toDF("doc_id", "text")
    val out = TextOps.trigramBackoffXent(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 4)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // doc 1: -ln(1)/1 must be +0.0 bit-for-bit (the q210 hash class)
    val z = byId(1L).getAs[Double]("xent")
    assert(z == 0.0 &&
      java.lang.Double.doubleToRawLongBits(z) == 0L, s"xent $z is -0.0")
    assert(byId(3L).getAs[Double]("xent") == 0.916291) // -ln(0.4)
    assert(byId(5L).getAs[Double]("xent") == 3.218876) // -ln(0.04)
    // doc 0 scores itself entirely from the first branch:
    // s(c|a,b)=1/1, s(d|b,c)=1/1 -> xent +0.0
    assert(byId(0L).getAs[Double]("xent") == 0.0)
    assert(byId(5L).getAs[Long]("n_pos") == 1L)
  }

  test("semDedup: of a similar pair the farther-from-centroid member " +
    "survives; a lone-bucket vector is never a duplicate") {
    // a and b share sign bucket 15; b sits farther from the bucket
    // centroid (lower s2c) so a is the duplicate. c is alone in
    // bucket 14 (first dim negative).
    val df = Seq(
      (1L, Array(1.0f, 1.0f, 1.0f, 1.0f)),
      (2L, Array(1.0f, 1.0f, 1.0f, 0.9f)),
      (3L, Array(-1.0f, 1.0f, 1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = SimilarityOps.semDedup(df, "vec_id", "embedding",
        tau = 0.5, signBits = 4)
      .orderBy("vec_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Int]("bucket") == 15)
    assert(byId(3L).getAs[Int]("bucket") == 14)
    assert(byId(1L).getAs[Double]("sim_centroid") >
      byId(2L).getAs[Double]("sim_centroid"),
      "vector 1 must sit closer to the centroid than 2")
    assert(byId(1L).getAs[Long]("is_dup") == 1L, "closer member drops")
    assert(byId(2L).getAs[Long]("is_dup") == 0L, "farther member kept")
    assert(byId(3L).getAs[Long]("is_dup") == 0L, "lone bucket kept")
  }

  test("daviesBouldin: two unit-scatter clusters 10 apart give " +
    "scatter 1.0 and r_max 0.2 on both sides") {
    val df = Seq(
      (1L, Array(0.0f, 0.0f), 0), (2L, Array(2.0f, 0.0f), 0),
      (3L, Array(10.0f, 0.0f), 1), (4L, Array(12.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.daviesBouldin(df, "vec_id", "embedding",
      "label").orderBy("label").collect()
    assert(out.length == 2)
    for (r <- out) {
      assert(r.getAs[Long]("n_vecs") == 2L)
      assert(r.getAs[Double]("scatter") == 1.0)
      assert(r.getAs[Double]("r_max") == 0.2)
    }
  }

  test("epochCappedMix: the small source caps at 1.25 epochs and its " +
    "freed budget moves to the uncapped source in one round") {
    // A: 4000 chars -> 1000 tokens; B: 400 chars -> 100 tokens.
    // budget = (12*1100) div 10 = 1320; w = (31.622777, 10.0).
    // want_B = 1320*10/41.622777 ~ 317.1 > cap_B = 125 -> capped.
    // fin_A = want_A + leftover = 1320 - 125 = 1195.0 (cap 1250 holds).
    val df = Seq(("A", "x" * 4000), ("B", "y" * 400)).toDF("src", "text")
    val out = MixtureOps.epochCappedMix(df, "src", "text")
      .orderBy("source").collect()
    val a = out(0); val b = out(1)
    assert(a.getAs[Long]("tokens") == 1000L)
    assert(b.getAs[Long]("tokens") == 100L)
    assert(b.getAs[Long]("capped") == 1L)
    assert(b.getAs[Double]("alloc_tokens") == 125.0)
    assert(b.getAs[Double]("epochs_used") == 1.25)
    assert(a.getAs[Long]("capped") == 0L)
    assert(a.getAs[Double]("alloc_tokens") == 1195.0)
    assert(a.getAs[Double]("epochs_used") == 1.195)
    assert(a.getAs[Double]("weight") == 31.622777)
    assert(b.getAs[Double]("weight") == 10.0)
  }

  test("tokenFertility: exact half-up ratios on a one-doc language") {
    // "ab cd": 2 words, 5 chars -> 2 bpe tokens, 5 bytes
    val df = Seq(("en", "ab cd")).toDF("lang", "text")
    val r = TextOps.tokenFertility(df, "lang", "text").collect()(0)
    assert(r.getAs[Long]("words") == 2L)
    assert(r.getAs[Long]("bpe_tokens") == 2L)
    assert(r.getAs[Long]("bytes") == 5L)
    assert(r.getAs[Double]("fertility") == 1.0)
    assert(r.getAs[Double]("bytes_per_token") == 2.5)
    assert(r.getAs[Double]("chars_per_word") == 2.5)
  }

  test("contaminationSpans: consecutive matched shingles merge into " +
    "one run; a clean doc reports zeros") {
    val df = Seq(
      (0L, "a b c d e", "src0"),        // benchmark: 3 shingles
      (1L, "x a b c d y z", "web"),     // positions 1,2 match -> run 2
      (2L, "p q r s t", "web")          // no match
    ).toDF("doc_id", "text", "source")
    val out = DedupOps.contaminationSpans(df, "doc_id", "text",
      col("source") === "src0").orderBy("doc_id").collect()
    assert(out.length == 2, "the benchmark doc itself is excluded")
    val d1 = out(0); val d2 = out(1)
    assert(d1.getAs[Long]("n_pos") == 5L)
    assert(d1.getAs[Long]("n_matched") == 2L)
    assert(d1.getAs[Long]("longest_run") == 2L)
    assert(d1.getAs[Double]("contamination") == 0.4)
    assert(d2.getAs[Long]("n_matched") == 0L)
    assert(d2.getAs[Long]("longest_run") == 0L)
    assert(d2.getAs[Double]("contamination") == 0.0)
  }

  test("contaminationSpans: split matches stay separate runs") {
    // matches at positions 0 and 2 (gap at 1) -> n_matched 2, run 1
    val df = Seq(
      (0L, "a b c p q r", "src0"),      // shingles: abc, bcp, cpq, pqr
      (1L, "a b c z p q r", "web")      // pos0 abc hit, pos4 pqr hit
    ).toDF("doc_id", "text", "source")
    val r = DedupOps.contaminationSpans(df, "doc_id", "text",
      col("source") === "src0").collect()(0)
    assert(r.getAs[Long]("n_matched") == 2L)
    assert(r.getAs[Long]("longest_run") == 1L)
  }

  test("ccnetBuckets: equal cross-entropies split into terciles by " +
    "doc_id and the per-cell stats are exact") {
    // every bigram is corpus-unique -> c12/c1 = 1 -> xent 0 for all
    val df = Seq((0L, "a b", "en"), (1L, "c d", "en"),
      (2L, "e f", "en")).toDF("doc_id", "text", "lang")
    val out = TextOps.ccnetBuckets(df, "doc_id", "text", "lang")
      .orderBy("tercile").collect()
    assert(out.length == 3)
    for ((r, i) <- out.zipWithIndex) {
      assert(r.getAs[Int]("tercile") == i + 1)
      assert(r.getAs[Long]("n_docs") == 1L)
      assert(r.getAs[Double]("min_xent") == 0.0)
      assert(r.getAs[Double]("max_xent") == 0.0)
      assert(r.getAs[Double]("mean_xent") == 0.0)
    }
  }
}
