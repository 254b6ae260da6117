package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventTimeWindows

/** Watermarked event-time windows: append mode finalizes a window only
  * after the watermark passes; late events beyond the lateness bound
  * are dropped.
  */
class EventTimeWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("tumbling window finalizes after watermark passes, drops too-late data") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Int)]
    val df = mem.toDS().toDF("ts", "user_id", "label")
    val out = EventTimeWindows.tumblingCounts(df, "ts", "user_id", "label",
      "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()

    // window [0,10): 3 events, 2 clicks
    mem.addData((ts(1), 1L, 1), (ts(2), 1L, 1), (ts(9), 1L, 0))
    q.processAllAvailable()
    assert(spark.table("win_out").count() == 0)   // window still open

    // event at t=30 → watermark 25 → [0,10) closes
    mem.addData((ts(30), 1L, 0))
    q.processAllAvailable()
    val closed = spark.table("win_out")
      .select("user_id", "imp", "clk").as[(Long, Long, Long)].collect()
    assert(closed.toSeq == Seq((1L, 3L, 2L)))

    // an event at t=3 is beyond lateness → dropped, window not re-emitted
    mem.addData((ts(3), 1L, 1))
    q.processAllAvailable()
    assert(spark.table("win_out").count() == 1)
    q.stop()
  }

  test("sliding windows emit one row per overlapping window once closed") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Int)]
    val df = mem.toDS().toDF("ts", "user_id", "label")
    val out = graft.streaming.EventTimeWindows.slidingCounts(
      df, "ts", "user_id", "label", "10 minutes", "5 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("slide_out")
      .outputMode("append").start()
    // one event at t=7 belongs to windows [0,10) and [5,15)
    mem.addData((ts(7), 1L, 1))
    mem.addData((ts(40), 1L, 0))   // advance watermark → both windows close
    q.processAllAvailable()
    val wins = spark.table("slide_out")
      .select("win_start", "imp").collect()
      .map(r => r.getTimestamp(0).getTime / 60000 -> r.getLong(1)).toSet
    q.stop()
    assert(wins.contains(0L -> 1L) && wins.contains(5L -> 1L))
  }

  test("stream-static enrichment joins each micro-batch against the dimension") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val out = graft.streaming.EventTimeWindows.enrich(
      mem.toDS().toDF("ts", "user_id"), dim, Seq("user_id"))
    val q = out.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    mem.addData((ts(1), 1L), (ts(2), 3L))
    q.processAllAvailable()
    val rows = spark.table("enrich_out").select("user_id", "tier")
      .as[(Long, Option[String])].collect().toSet
    q.stop()
    assert(rows == Set((1L, Some("gold")), (3L, None)))
  }

  test("session_window merges events within the gap and closes on watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Int)]
    val df = mem.toDS().toDF("ts", "user_id", "label")
    val out = graft.streaming.EventTimeWindows.sessionCounts(
      df, "ts", "user_id", "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()

    // events at 1, 5, 12 chain into one session (gaps < 10 min);
    // event at 40 starts a new session and its watermark (35) closes
    // the first one (which ended at 12+10=22)
    mem.addData((ts(1), 1L, 1), (ts(5), 1L, 0), (ts(12), 1L, 1))
    q.processAllAvailable()
    mem.addData((ts(40), 1L, 0))
    q.processAllAvailable()

    val sessions = spark.table("sess_out")
      .select("user_id", "n_events").as[(Long, Long)].collect()
    assert(sessions.toSeq == Seq((1L, 3L)))
    q.stop()
  }
}
