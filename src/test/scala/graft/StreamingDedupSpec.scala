package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingDedup

/** Watermark-bounded streaming dedup: duplicates inside the horizon are
  * dropped; state eviction lets the same content re-emit after the
  * watermark passes (cross-horizon dedup is the batch layer's job).
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("duplicates within the watermark horizon are dropped; state evicts after") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val df = mem.toDS().toDF("ts", "event_id", "text")
    val out = StreamingDedup.dedupByFingerprint(df, "ts", "text", "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()

    // same content twice in the horizon → one survivor (+ one distinct)
    mem.addData((ts(1), 1L, "alpha doc"), (ts(2), 2L, "alpha doc"),
      (ts(3), 3L, "beta doc"))
    q.processAllAvailable()
    assert(spark.table("dedup_out").count() == 2)

    // advance the watermark far past 3 + 10min → "alpha doc" state evicts
    mem.addData((ts(60), 4L, "gamma doc"))
    q.processAllAvailable()
    assert(spark.table("dedup_out").count() == 3)

    // re-ingesting evicted content is a NEW row (horizon semantics)
    mem.addData((ts(61), 5L, "alpha doc"))
    q.processAllAvailable()
    val ids = spark.table("dedup_out").select("event_id").as[Long].collect().sorted
    assert(ids.sameElements(Array(1L, 3L, 4L, 5L)), s"got ${ids.toSeq}")
    q.stop()
  }

  test("approxDistinctReport is within HLL tolerance of exact counts") {
    val df = (1L to 5000L).toDF("id")
      .selectExpr("id", "id % 17 AS low_card", "CAST(id % 997 AS STRING) AS mid_card")
    val rep = graft.operators.QualityChecks
      .approxDistinctReport(df, Seq("id", "low_card", "mid_card"), 0.05)
      .as[(String, Long)].collect().toMap
    assert(math.abs(rep("low_card") - 17L) <= 2)
    assert(math.abs(rep("mid_card") - 997L) <= 100)
    assert(math.abs(rep("id") - 5000L) <= 500)
  }
}
