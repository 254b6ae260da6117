package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, MixtureOps, TextOps}

/** Round-24 specs: shard-JS zero on a perfectly homogeneous corpus,
  * dedup-policy survivor arithmetic with pinned tie-breaks, the
  * burstiness double chain, vocab-overlap Jaccard, the topic×lang
  * grid argmax, and the Gopher ablation cross-checked against the
  * flag table it melts.
  */
class Round24OpsSpec extends SparkSpec {
  import spark.implicits._

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("shardJsAudit: a corpus of identical documents is exactly " +
    "homogeneous (js = 0 in every shard), token totals partition") {
    val df = Seq.tabulate(40)(i => (i.toLong, "a a b"))
      .toDF("doc_id", "text")
    val out = MixtureOps.shardJsAudit(df, "doc_id", "text", 4).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Double]("js_nats") == 0.0))
    assert(out.map(_.getAs[Long]("n_tokens")).sum == 120L)
    // and a lone shard is trivially the corpus
    val one = MixtureOps.shardJsAudit(df, "doc_id", "text", 1).collect()
    assert(one.length == 1 && one(0).getAs[Double]("js_nats") == 0.0)
  }

  test("dedupPolicyCompare: keep-first / keep-longest / " +
    "keep-most-distinct price the same cluster differently; ties " +
    "break to the smaller id") {
    val df = Seq(
      (1L, "a b c"),       // cluster "a b": n=3 nd=3
      (2L, "a b c c d"),   // n=5 nd=4 (longest AND most distinct)
      (3L, "a b"),         // n=2 nd=2
      (4L, "z w p"),       // cluster "z w": ties with d5 on n and nd
      (5L, "z w q"),
      (6L, "x y")          // singleton: excluded
    ).toDF("doc_id", "text")
    val out = DedupOps.dedupPolicyCompare(df, "doc_id", "text", 2)
      .orderBy("policy").collect()
    assert(out.map(_.getString(0)).toSeq ==
      Seq("keep_first", "keep_longest", "keep_most_distinct"))
    // both clusters: tot = 10 + 6, cnt = 3 + 2
    for (row <- out) {
      assert(row.getAs[Long]("n_clusters") == 2L)
      assert(row.getAs[Long]("n_docs") == 5L)
    }
    // keep_first: d1 (3) + d4 (3); keep_longest: d2 (5) + d4 (3,
    // tie -> smaller id); keep_most_distinct: d2 (5) + d4 (3)
    assert(out(0).getAs[Long]("tokens_kept") == 6L)
    assert(out(1).getAs[Long]("tokens_kept") == 8L)
    assert(out(2).getAs[Long]("tokens_kept") == 8L)
    assert(out(0).getAs[Long]("tokens_dropped") == 10L)
    // kept_ppm = round(6e6/16) = 375000
    assert(out(0).getAs[Long]("kept_ppm") == 375000L)
    assert(out(1).getAs[Long]("kept_ppm") == 500000L)
  }

  test("termBurstiness: conditional mean and zero-inclusive VMR " +
    "follow the exact integer moments") {
    val df = Seq((1L, "t t t"), (2L, "t x"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = TextOps.termBurstiness(df, "doc_id", "text", 2)
      .orderBy("term").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("t", "x"))
    val t = out(0)
    assert(t.getAs[Long]("df") == 2L && t.getAs[Long]("occ") == 4L)
    assert(t.getAs[Double]("burst") == 2.0)
    val muT = 4.0 / 3
    assert(t.getAs[Double]("vmr") == r6((10.0 / 3 - muT * muT) / muT))
    val x = out(1)
    assert(x.getAs[Double]("burst") == 1.0)
    val muX = 2.0 / 3
    assert(x.getAs[Double]("vmr") == r6((2.0 / 3 - muX * muX) / muX))
  }

  test("vocabOverlap: distinct-set Jaccard as exact ppm") {
    val df = Seq(
      (1L, "a b", "A"), (2L, "b c", "A"),  // vocab(A) = {a,b,c}
      (3L, "b c d", "B")                   // vocab(B) = {b,c,d}
    ).toDF("doc_id", "text", "source")
    val out = TextOps.vocabOverlap(df, "source", "text").collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[String]("source_a") == "A" &&
      r.getAs[String]("source_b") == "B")
    assert(r.getAs[Long]("v_a") == 3L && r.getAs[Long]("v_b") == 3L)
    assert(r.getAs[Long]("inter") == 2L)
    assert(r.getAs[Long]("jaccard_ppm") == 500000L)
  }

  test("topicLangGrid: row-local argmax with profile priority, " +
    "per-language row shares") {
    val profiles = Seq(
      "sql" -> Seq("join", "filter", "group", "query", "sort", "agg"),
      "infra" -> Seq("spark", "stream", "batch", "hash", "merge", "scan"),
      "data" -> Seq("data", "row", "column", "table", "value", "vector"))
    val df = Seq(
      (1L, "join join", "en"),   // sql 2 / 0 / 0 -> sql
      (2L, "spark data", "en"),  // 0 / 1 / 1 -> infra (priority)
      (3L, "data", "fr")         // 0 / 0 / 1 -> data
    ).toDF("doc_id", "text", "lang")
    val out = TextOps.topicLangGrid(df, "lang", "doc_id", "text",
        profiles)
      .orderBy("lang", "lang_pred").collect()
    assert(out.map(r => (r.getString(0), r.getString(1),
      r.getAs[Long]("n_docs"), r.getAs[Long]("share_ppm"))).toSeq ==
      Seq(("en", "infra", 1L, 500000L), ("en", "sql", 1L, 500000L),
        ("fr", "data", 1L, 1000000L)))
  }

  test("gopherAblation: solo/gross attribution agrees with the flag " +
    "table it melts") {
    val stop = Seq("the", "a")
    val docs = Seq(
      (1L, ("w " * 10).trim),            // short, no stopword
      (2L, "the " + ("word " * 40).trim), // repeated word: top-share +
                                          // distinct-ratio
      (3L, ("the quick brown vixen leaps over lazy hounds " * 5).trim),
      (4L, ("zz " * 50).trim)             // 2-char words, no stopword
    ).toDF("doc_id", "text")
    val flags = TextOps.gopherFlags(docs, "doc_id", "text", stop)
      .orderBy("doc_id").collect()
    val toks = docs.orderBy("doc_id")
      .select(size(split(col("text"), " ")).cast("long")).collect()
      .map(_.getLong(0))
    val rules = Seq("f_word_count", "f_mean_word_len",
      "f_top_word_share", "f_no_stopword", "f_distinct_ratio")
    val fm = flags.map(r => rules.map(c => r.getAs[Long](c)))
    val totTok = toks.sum
    val out = TextOps.gopherAblation(docs, "doc_id", "text", stop)
      .orderBy("rule").collect()
    val ruleNames = Seq("distinct_ratio", "mean_word_len",
      "no_stopword", "top_word_share", "word_count")
    val colOf = Map("word_count" -> 0, "mean_word_len" -> 1,
      "top_word_share" -> 2, "no_stopword" -> 3, "distinct_ratio" -> 4)
    assert(out.map(_.getString(0)).toSeq == ruleNames)
    for (row <- out) {
      val j = colOf(row.getString(0))
      val fails = fm.indices.filter(i => fm(i)(j) == 1L)
      val solo = fails.filter(i => fm(i).sum == 1L)
      assert(row.getAs[Long]("docs_fail") == fails.size.toLong,
        row.getString(0))
      assert(row.getAs[Long]("docs_fail_solo") == solo.size.toLong)
      assert(row.getAs[Long]("tokens_lost_any") ==
        fails.map(toks(_)).sum)
      assert(row.getAs[Long]("tokens_lost_solo") ==
        solo.map(toks(_)).sum)
      assert(row.getAs[Long]("lost_any_ppm") ==
        (fails.map(toks(_)).sum * 2000000L + totTok) / (2 * totTok))
    }
  }
}
