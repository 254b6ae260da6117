package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.streaming.StreamingServingSnapshot
import graft.streaming.StreamingServingSnapshot.Ev

/** The flagship serving-snapshot rank state maintained ONLINE equals
  * the batch `snap` stage (q432's rank source), including eviction of
  * items that fell out of the ≤10-event frame.
  */
class StreamingServingSnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("streamed snapshot (latest version per user) equals the batch " +
    "last-10 CTR census across micro-batches, with frame eviction") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamingServingSnapshot(mem.toDS(), frameLen = 10)
    val q = out.writeStream.format("memory").queryName("snap_out")
      .outputMode("append").start()

    // user 1: 15 events over 3 items — the first 5 must EVICT; the
    // early "gone" item must vanish from the final snapshot. user 2:
    // a short 4-event history in one batch.
    val evs =
      (0 until 5).map(i => Ev(1L, i.toLong, i.toLong * 100, "gone", 1)) ++
      (5 until 15).map(i => Ev(1L, i.toLong, i.toLong * 100,
        if (i % 2 == 0) "click" else "view", i % 3 % 2)) ++
      (0 until 4).map(i => Ev(2L, 100L + i, i.toLong * 50, "solo", 1 - (i % 2)))
    mem.addData(evs.take(8): _*)
    q.processAllAvailable()
    mem.addData(evs.drop(8): _*)   // ring must carry + evict across batches
    q.processAllAvailable()
    q.stop()

    val raw = spark.table("snap_out")
    val latest = raw
      .withColumn("__mx", max(col("ver")).over(
        Window.partitionBy("user_id")))
      .filter(col("ver") === col("__mx"))
      .select("user_id", "item", "imp", "clk", "rank_ppm")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

    // batch twin: the q432 snap stage formula over the full log
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val batch = evs.toDF()
      .withColumn("rn", row_number().over(w))
      .withColumn("__mx", max(col("rn")).over(Window.partitionBy("user_id")))
      .filter(col("rn") > col("__mx") - 10)
      .groupBy(col("user_id"), col("item"))
      .agg(count(lit(1)).as("imp"), sum(col("label")).as("clk"))
      .select(col("user_id"), col("item"), col("imp"), col("clk"),
        expr("CAST((clk * 2000000 + imp) div (2 * imp) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

    assert(latest == batch)
    assert(!latest.exists(_._2 == "gone"),
      "items evicted from the frame must leave the latest snapshot")
  }
}
