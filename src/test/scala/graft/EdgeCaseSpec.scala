package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{DedupOps, RelationalOps, SimilarityOps, TextOps}

/** Degenerate inputs: empty frames, single rows, tiny users, malformed
  * JSON — operators must return empty/defaulted results, never throw.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val evSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("event_id", LongType),
    StructField("ts", LongType), StructField("label", IntegerType)))
  private lazy val empty =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], evSchema)

  test("PIT window, snapshot, and split handle an empty frame") {
    val order = Seq(col("ts"), col("event_id"))
    assert(RelationalOps.pitWindow(empty, "user_id", order, "label", 10).count() == 0)
    assert(RelationalOps.userSnapshot(empty, "user_id", order, "label", 10).count() == 0)
    val rn = RelationalOps.rowNumber(empty, "user_id", order)
      .withColumn("u_cnt", count(lit(1)).over(Window.partitionBy("user_id")))
    assert(RelationalOps.threeWaySplit(rn, "rn", "u_cnt", 10, 0.2).count() == 0)
  }

  test("users with fewer rows than the holdout are entirely holdout") {
    val df = (0 until 4).map(i => (1L, i.toLong, i.toLong, 0))
      .toDF("user_id", "event_id", "ts", "label")
    val rn = RelationalOps.rowNumber(df, "user_id", Seq(col("ts"), col("event_id")))
      .withColumn("u_cnt", count(lit(1)).over(Window.partitionBy("user_id")))
    val codes = RelationalOps.threeWaySplit(rn, "rn", "u_cnt", 10, 0.2)
      .select("istest").as[Int].collect()
    assert(codes.forall(_ == 2))
  }

  test("cosineTopK of a single vector returns no neighbors") {
    val one = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    assert(SimilarityOps.cosineTopK(one, "vec_id", "embedding", 5).count() == 0)
  }

  test("dedup of an empty corpus yields no signatures, candidates, or pairs") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val sh = DedupOps.shingles(docs, "doc_id", "text")
    assert(sh.count() == 0)
    assert(DedupOps.minhashCandidates(
      DedupOps.minhashSignature(sh, "doc_id", 4, 2), "doc_id", 4, 2).count() == 0)
    assert(DedupOps.simhash(docs, "doc_id", "text").count() == 0)
    assert(DedupOps.exactDedup(docs, "doc_id", "text").count() == 0)
  }

  test("jsonExtractLong returns null for malformed or missing JSON, never throws") {
    val df = Seq((1L, "{\"k\": 5}"), (2L, "not json"), (3L, "{\"other\": 1}"), (4L, null))
      .toDF("id", "props")
    val out = TextOps.jsonExtractLong(df, "props", "$.k", "k")
      .orderBy("id").select("k").collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out.toSeq == Seq(Some(5L), None, None, None))
  }

  test("dictEncode treats null keys as unseen (default 0)") {
    val df = Seq(Some("A"), None).toDF("k")
    val out = RelationalOps.dictEncode(df, "k", "code", Map("A" -> 1))
      .select("code").as[Int].collect().sorted
    assert(out.toSeq == Seq(0, 1))
  }

  test("sessionize on a single event yields session 1") {
    val df = Seq((1L, 1L, 1700000000000000L)).toDF("user_id", "event_id", "us")
      .withColumn("ts", timestamp_micros($"us"))
    val s = TextOps.sessionize(df, "user_id", "ts", "event_id", 1800L)
      .select("session_id").as[Long].head()
    assert(s == 1L)
  }

  test("round-3 ops on degenerate inputs: empty/single-token/all-negative") {
    import graft.operators.{MetricOps, MixtureOps, RetrievalOps, SamplingOps}
    val docs = Seq((1L, "one")).toDF("doc_id", "text")
    // single-token doc: one chunk, survives chunk dedup unchanged
    val cd = DedupOps.chunkDedup(docs, "doc_id", "text", 20)
      .as[(Long, Long, Long, String)].collect()
    assert(cd.toSeq == Seq((1L, 1L, 1L, "one")))
    // repetition stats on a 1-token doc: no bigrams -> frac 0, no junk
    val rep = TextOps.repetitionStats(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double, Int)].collect().head
    assert(rep == ((1L, 1L, 1.0, 0.0, 1)))   // top_tok_frac 1.0 flags junk
    // bm25 where no document contains any query term: empty, no throw
    assert(RetrievalOps.bm25(docs, "doc_id", "text", Seq("absent")).count() == 0)
    // rankingMetrics with zero positives anywhere: empty, no divide-by-zero
    val rm = MetricOps.rankingMetrics(
      Seq((1L, 1L, 0.5, 0)).toDF("u", "i", "s", "l"), "u", "i", "s", "l", 5)
    assert(rm.count() == 0)
    // weightedSample asking for more rows than exist returns all rows
    val ws = SamplingOps.weightedSample(
      Seq((1L, 1.0), (2L, 1.0)).toDF("id", "w"), "id", "w", 10)
    assert(ws.count() == 2)
    // mixtureSample over sources absent from the data: empty summary
    val ms = MixtureOps.mixtureSample(
      Seq((1L, "zzz")).toDF("id", "source"), "source", "id", Map("a" -> 1.0))
    assert(ms.count() == 0)
  }
}
