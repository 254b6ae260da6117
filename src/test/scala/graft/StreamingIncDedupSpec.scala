package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.DedupOps
import graft.streaming.StreamingIncDedup

/** The stream-static admit filter must agree with the batch
  * incremental-dedup anti-join for the same rows (modulo the batch
  * op's in-batch keep-min-id, exercised separately) — the invariant
  * that lets the fingerprint store built by the nightly batch serve
  * the live ingest unchanged.
  */
class StreamingIncDedupSpec extends SparkSpec {
  import spark.implicits._

  test("stream admit == batch anti-join against the same store; " +
    "late micro-batches filter identically") {
    val history = Seq((1L, "a b c"), (2L, "d e f"))
      .toDF("doc_id", "text")
    val store = history.select(md5(col("text")).as("fp")).distinct()

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val admitted = StreamingIncDedup.admit(
      mem.toDS().toDF("doc_id", "text"), "doc_id", "text", store, "fp")
    val q = admitted.writeStream.format("memory")
      .queryName("inc_dedup_stream").outputMode("append").start()

    mem.addData((10L, "a b c"), (11L, "x y z"))
    q.processAllAvailable()
    // batch 2 arrives later — the static store filters it identically
    mem.addData((12L, "d e f"), (13L, "p q r"))
    q.processAllAvailable()

    val streamed = spark.table("inc_dedup_stream")
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == Set(11L, 13L),
      s"store members must be rejected, novelties admitted: $streamed")

    // batch twin on the union of both micro-batches (all-distinct
    // texts, so the keep-min-id step is a no-op)
    val incoming = Seq((10L, "a b c"), (11L, "x y z"),
      (12L, "d e f"), (13L, "p q r")).toDF("doc_id", "text")
    val batch = DedupOps.incrementalDedup(history, incoming,
      "doc_id", "text").select("doc_id").as[Long].collect().toSet
    assert(batch == streamed, s"stream/batch divergence: $batch")
    q.stop()
  }
}
