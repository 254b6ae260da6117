package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, MixtureOps, SimilarityOps, TextOps}

/** Round-25 specs: the source-JS hand chain on a disjoint-vocab
  * corpus, the copula grid's rank/lift arithmetic, dedup-savings
  * attribution (within vs cross), the corpus delta on explicit
  * snapshots, the SemDeDup sweep against the already-verified
  * fixed-tau op, and STTR/hapax integer arithmetic.
  */
class Round25OpsSpec extends SparkSpec {
  import spark.implicits._

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r12(v: Double): Double =
    BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("sourceJsAudit: disjoint-vocab halves follow the present-term" +
    " + closed-form-tail chain exactly") {
    val df = Seq((1L, "a a", "A"), (2L, "b b", "B"))
      .toDF("doc_id", "text", "source")
    val out = MixtureOps.sourceJsAudit(df, "source", "text")
      .orderBy("source").collect()
    // per source: one present token, p = 1, q = 0.5, m = 0.75;
    // corpus mass of present tokens = 2 of N = 4
    val p = 1.0; val q = 2.0 / 4
    val m = (p + q) / 2
    val term = r12((p * math.log(p / m) + q * math.log(q / m)) / 2)
    val corr = r12((4.0 - 2.0) / 4 * math.log(2.0) / 2)
    val exp = r6(term + corr)
    assert(out.length == 2)
    for (row <- out) {
      assert(row.getAs[Long]("n_tokens") == 2L)
      assert(row.getAs[Double]("js_nats") == exp, row.getString(0))
    }
  }

  test("qualityLengthGrid: decile ranks and independence lift on a " +
    "fully spread fixture") {
    val df = Seq(
      (1L, "a"),         // len 1, dr 1.0
      (2L, "a a"),       // len 2, dr 0.5
      (3L, "a b c"),     // len 3, dr 1.0
      (4L, "a a b b")    // len 4, dr 0.5
    ).toDF("doc_id", "text")
    val out = TextOps.qualityLengthGrid(df, "doc_id", "text")
      .orderBy("len_decile", "q_decile").collect()
    // len ranks 1..4 -> deciles 0,2,5,7; dr ranks (0.5:#2,#4 then
    // 1.0:#1,#3) -> doc2:0, doc4:2, doc1:5, doc3:7
    val cells = out.map(r => (r.getLong(0), r.getLong(1),
      r.getAs[Long]("n_docs"), r.getAs[Double]("lift"))).toSeq
    assert(cells == Seq((0L, 5L, 1L, 4.0), (2L, 0L, 1L, 4.0),
      (5L, 7L, 1L, 4.0), (7L, 2L, 1L, 4.0)))
  }

  test("dedupSavings: within-source copies vs cross-source extras " +
    "attribute to the losing source") {
    val df = Seq(
      (1L, "x y", "A"), (2L, "x y", "A"), // within-A copy
      (3L, "x y", "B"),                    // cross copy, survivor in A
      (4L, "z", "B")                       // unique
    ).toDF("doc_id", "text", "source")
    val out = DedupOps.dedupSavings(df, "doc_id", "source", "text")
      .orderBy("source").collect()
    val a = out(0)
    assert(a.getAs[Long]("tokens_raw") == 4L)
    assert(a.getAs[Long]("dup_tokens_within") == 2L)
    assert(a.getAs[Long]("dup_tokens_cross_extra") == 0L)
    assert(a.getAs[Long]("savings_ppm") == 500000L)
    val b = out(1)
    assert(b.getAs[Long]("tokens_raw") == 3L)
    assert(b.getAs[Long]("dup_tokens_within") == 0L)
    assert(b.getAs[Long]("dup_tokens_cross_extra") == 2L)
    assert(b.getAs[Long]("savings_ppm") == (2L * 2000000L + 3L) / 6L)
  }

  test("corpusDelta: added/removed/common docs and token deltas " +
    "per source") {
    val old = Seq((1L, "w w w", "A"), (2L, "w w", "A"),
      (3L, "w", "B")).toDF("doc_id", "text", "source")
    val nw = Seq((2L, "w w", "A"), (3L, "w", "B"),
      (4L, "w w w w", "B")).toDF("doc_id", "text", "source")
    val out = MixtureOps.corpusDelta(old, nw, "doc_id", "source",
        "text")
      .orderBy("source").collect()
    val a = out(0)
    assert(a.getAs[Long]("docs_added") == 0L &&
      a.getAs[Long]("docs_removed") == 1L &&
      a.getAs[Long]("docs_common") == 1L &&
      a.getAs[Long]("tokens_added") == 0L &&
      a.getAs[Long]("tokens_removed") == 3L)
    val b = out(1)
    assert(b.getAs[Long]("docs_added") == 1L &&
      b.getAs[Long]("docs_removed") == 0L &&
      b.getAs[Long]("docs_common") == 1L &&
      b.getAs[Long]("tokens_added") == 4L &&
      b.getAs[Long]("tokens_removed") == 0L)
  }

  test("semDedupSweep: every threshold row agrees with the " +
    "fixed-tau semDedup, and survivors partition") {
    val df = Seq(
      (1L, Array(1.0f, 0.1f, 0.1f, 0.1f), 0),
      (2L, Array(0.9f, 0.2f, 0.1f, 0.1f), 0),
      (3L, Array(0.1f, 0.9f, 0.2f, 0.3f), 0),
      (4L, Array(0.2f, 0.8f, 0.3f, 0.2f), 0)
    ).toDF("vec_id", "embedding", "label")
    val taus = Seq(20, 50, 80, 95)
    val sweep = SimilarityOps.semDedupSweep(df, "vec_id", "embedding",
        4, taus)
      .orderBy("tau_pct").collect()
    assert(sweep.map(_.getLong(0)).toSeq == taus.map(_.toLong))
    for (row <- sweep) {
      val tau = row.getLong(0).toDouble / 100
      val fixed = SimilarityOps.semDedup(df, "vec_id", "embedding",
          tau, 4)
        .agg(sum(col("is_dup"))).collect()(0).getLong(0)
      assert(row.getAs[Long]("n_dup") == fixed, s"tau $tau")
      assert(row.getAs[Long]("n_dup") +
        row.getAs[Long]("n_survivors") == row.getAs[Long]("n_vecs"))
    }
    // sanity: at tau .20 the near-parallel pairs are dups
    assert(sweep(0).getAs[Long]("n_dup") >= 2L)
  }

  test("sttr: prefix TTR is length-controlled, hapax counts the " +
    "once-only vocabulary") {
    val w30 = (1 to 30).map(i => s"a$i").mkString(" ")
    val df = Seq(
      (1L, w30, "A"),        // 30 distinct -> ttr 1000000
      (2L, "a1 a1", "A"),    // short: no sttr row; makes a1 c=3
      (3L, "b b", "B")       // short only: n_docs_sttr = 0
    ).toDF("doc_id", "text", "source")
    val out = TextOps.sttr(df, "source", "text", 30)
      .orderBy("source").collect()
    val a = out(0)
    assert(a.getAs[Long]("n_docs_sttr") == 1L)
    assert(a.getAs[Long]("mean_sttr_ppm") == 1000000L)
    assert(a.getAs[Long]("vocab") == 30L)
    // a1 occurs 3x, the other 29 once: hapax_ppm = round(29e6/30)
    assert(a.getAs[Long]("hapax_ppm") == (29L * 2000000L + 30L) / 60L)
    val b = out(1)
    assert(b.getAs[Long]("n_docs_sttr") == 0L)
    assert(b.isNullAt(b.fieldIndex("mean_sttr_ppm")))
    assert(b.getAs[Long]("vocab") == 1L &&
      b.getAs[Long]("hapax_ppm") == 0L)
  }
}
