package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.JoinOps
import graft.streaming.StreamingIntervalJoin

/** Batch ≡ stream parity for the interval overlap join: the streamed
  * pair set over matured data equals JoinOps.intervalOverlapJoin on
  * the same rows, and the watermark + max-span bound evicts state
  * without losing in-horizon pairs.
  */
class StreamingIntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private val base = 600000L * 60000L // ms, well above the epoch watermark
  private def ts(min: Long) = new Timestamp(base + min * 60000L)

  test("streamed overlap pairs equal the batch operator on matured data") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp, Timestamp)]
    val st = StreamingIntervalJoin.overlaps(
      mem.toDS().toDF("k", "id", "lo", "hi"),
      "k", "id", "lo", "hi", maxSpan = "30 minutes",
      watermarkDelay = "5 minutes")
    val q = st.writeStream.format("memory").queryName("iv_out")
      .outputMode("append").start()

    // key 1: [0,10], [5,20] overlap; [20,30] touches [5,20] at a point
    // (closed intervals → overlap 0); key 2: [0,8] and [9,15] gap
    val rows = Seq(
      (1L, 1L, ts(0), ts(10)), (1L, 2L, ts(5), ts(20)),
      (1L, 3L, ts(20), ts(30)),
      (2L, 4L, ts(0), ts(8)), (2L, 5L, ts(9), ts(15)))
    mem.addData(rows: _*)
    q.processAllAvailable()
    // advance the watermark far enough that all pairs have matured
    mem.addData((9L, 99L, ts(500), ts(501)))
    q.processAllAvailable()

    val streamed = spark.table("iv_out")
      .filter(col("k") < 9)
      .select("k", "id_a", "id_b", "overlap")
      .as[(Long, Long, Long, Long)].collect().toSet

    val batch = JoinOps.intervalOverlapJoin(
        rows.toDF("k", "id", "lo", "hi")
          .select(col("k"), col("id"),
            unix_micros(col("lo")).as("lo"), unix_micros(col("hi")).as("hi")),
        "k", "id", "lo", "hi", binWidth = 600000000L)
      .as[(Long, Long, Long, Long)].collect().toSet

    assert(batch == Set((1L, 1L, 2L, 5L * 60000000L),
      (1L, 2L, 3L, 0L)), s"batch fixture drifted: $batch")
    assert(streamed == batch, s"stream $streamed != batch $batch")
    q.stop()
  }

  test("pairs beyond the max-span horizon are not emitted (state evicted)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp, Timestamp)]
    val st = StreamingIntervalJoin.overlaps(
      mem.toDS().toDF("k", "id", "lo", "hi"),
      "k", "id", "lo", "hi", maxSpan = "10 minutes",
      watermarkDelay = "1 minutes")
    val q = st.writeStream.format("memory").queryName("iv_out2")
      .outputMode("append").start()
    // a long-lived interval [0, 100] violates the <=10-minute span
    // contract; a late starter at 50 overlaps it in REAL terms but the
    // state bound (lo_b >= lo_a - maxSpan) excludes the pair — the
    // documented trade for bounded state
    mem.addData((1L, 1L, ts(0), ts(100)))
    q.processAllAvailable()
    mem.addData((1L, 2L, ts(50), ts(55)))
    q.processAllAvailable()
    mem.addData((9L, 99L, ts(500), ts(501)))
    q.processAllAvailable()
    assert(spark.table("iv_out2").filter(col("k") < 9).count() == 0)
    q.stop()
  }
}
