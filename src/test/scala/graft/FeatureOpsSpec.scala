package graft

import org.apache.spark.sql.functions._
import graft.operators.{RelationalOps, TextOps}
import graft.ml.FeatMeta

/** Feature-engineering semantics: z-score guards, dict-encode default,
  * constant-prune, ordered collect, sessionization boundary, FeatMeta.
  */
class FeatureOpsSpec extends SparkSpec {
  import spark.implicits._

  test("A5/F3: z-score uses train-only stats (stddev_samp, ddof=1)") {
    val all = Seq(1.0, 2.0, 3.0, 100.0).toDF("x")
    val train = Seq(1.0, 2.0, 3.0).toDF("x")   // mean 2, stddev_samp 1
    val z = RelationalOps.zscore(all, train, "x", "z")
      .orderBy("x").select("z").as[Double].collect()
    assert(z.toSeq == Seq(-1.0, 0.0, 1.0, 98.0))
  }

  test("A5 guard: std <= 0 falls back to 1 (constant train column)") {
    val train = Seq(5.0, 5.0, 5.0).toDF("x")
    val z = RelationalOps.zscore(train, train, "x", "z")
      .select("z").as[Double].collect()
    assert(z.forall(_ == 0.0))   // (5-5)/1 = 0, not NaN/Inf
  }

  test("A5 guard: empty train frame gives mean 0, std 1") {
    val all = Seq(2.0).toDF("x")
    val train = all.filter($"x" < 0)
    val z = RelationalOps.zscore(all, train, "x", "z")
      .select("z").as[Double].collect()
    assert(z.toSeq == Seq(2.0))
  }

  test("P5: dict encode maps unseen keys to 0") {
    val df = Seq("A", "B", "ZZZ").toDF("k")
    val out = RelationalOps.dictEncode(df, "k", "code", Map("A" -> 1, "B" -> 2))
      .orderBy("k").select("code").as[Int].collect()
    assert(out.toSeq == Seq(1, 2, 0))
  }

  test("P8: constant-prune report flags single-valued columns") {
    val df = Seq((1, 7, "x"), (2, 7, "y")).toDF("a", "const", "s")
    val rep = RelationalOps.constPruneReport(df, Seq("a", "const", "s"))
      .orderBy("col_name").as[(String, Long, Int)].collect()
    assert(rep.toSeq == Seq(("a", 2L, 1), ("const", 1L, 0), ("s", 2L, 1)))
  }

  test("A2: collect list order follows the declared order keys, not arrival") {
    val df = Seq((1L, 30L, 3L), (1L, 10L, 1L), (1L, 20L, 2L))
      .toDF("k", "ts", "v")
    val out = RelationalOps.orderedCollectList(df, "k", "v", Seq("ts"), "vs")
      .select("vs").as[Seq[Long]].head()
    assert(out == Seq(1L, 2L, 3L))
  }

  test("sessionize: gap strictly greater than threshold starts a new session") {
    val base = 1700000000000000L // epoch micros
    val df = Seq(
      (1L, 1L, base),
      (1L, 2L, base + 1800000000L),               // exactly 30 min — same session
      (1L, 3L, base + 1800000000L + 1800000001L)) // 30 min + 1 µs — new session
      .toDF("user_id", "event_id", "us")
      .withColumn("ts", timestamp_micros($"us"))
    val out = TextOps.sessionize(df, "user_id", "ts", "event_id", 1800L)
      .orderBy("event_id").select("session_id").as[Long].collect()
    assert(out.toSeq == Seq(1L, 1L, 2L))
  }

  test("normalizeText lowercases, strips punct, drops stopwords, counts removals") {
    val df = Seq((1L, "The QUICK, brown fox! The end.")).toDF("doc_id", "text")
    val out = TextOps.normalizeText(df, "doc_id", "text", Seq("the", "a"))
      .as[(Long, String, Long)].head()
    assert(out == ((1L, "quick brown fox end", 2L)))
  }

  test("FeatMeta: cardinality = max+1 from train, positional input order kept") {
    val train = Seq((3L, 1L, 0.5), (7L, 2L, 1.5)).toDF("u", "i", "d")
    val meta = FeatMeta.derive(train, Seq("u", "i"), Seq("d"))
    assert(meta.sparse.map(f => (f.name, f.cardinality)) == Seq(("u", 8L), ("i", 3L)))
    assert(meta.inputCols == Seq("u", "i", "d"))
    assert(meta.toJson.contains(""""cardinality":8"""))
  }
}
