package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.streaming.StreamingServingSnapshot
import graft.streaming.StreamingServingSnapshot.Ev

/** Streaming-fed flagship ROUND TRIP — the reference's deployment
  * shape end-to-end: the rank state is maintained ONLINE by the
  * streaming serving snapshot (the Redis hash updated as events
  * arrive — offline_to_online/recall/s1_user_to_redis.py:24-36 →
  * online/utils/redis_caller.py:12-37), then the full q432
  * recall → rank → respond pipeline reads THAT state table and must
  * return exactly the batch response on the same event prefix.
  */
class FlagshipStreamRoundTripSpec extends SparkSpec {
  import spark.implicits._

  test("flagship response from the stream-maintained snapshot equals " +
    "the batch q432 response on the same prefix") {
    // deterministic fixture: 6 users × 14 events over 4 item types,
    // values straddling the label (>100) and seen (>150) thresholds;
    // every user has >10 events so the stream ring must evict.
    val itemsPool = Seq("click", "view", "purchase", "signup")
    val rows = for {
      u <- 1L to 6L
      i <- 0 until 14
    } yield {
      val item = itemsPool(((u * 7 + i * 3) % 4).toInt)
      val value = ((u * 13 + i * 29) % 200).toDouble
      (u, u * 100 + i, (i * 10 + (u % 3)).toLong, item, value)
    }
    val events = rows.toDF("user_id", "event_id", "ts", "event_type",
      "value")
    // small user embeddings (8-dim, mixed signs so the 4-bit bucket
    // spreads), deterministic from the user id
    val embeddings = (1L to 6L).map { u =>
      (u, (0 until 8).map(d =>
        (((u * 31 + d * 17) % 13).toFloat - 6.0f) / 7.0f).toArray)
    }.toDF("vec_id", "embedding")

    // --- online: feed the events through the streaming snapshot in
    // two micro-batches (out of order across the batch boundary to
    // exercise the merge), keep each user's latest version.
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingServingSnapshot(mem.toDS(),
        frameLen = Flagship.SNAPSHOT_FRAME)
      .writeStream.format("memory").queryName("rt_snap")
      .outputMode("append").start()
    val evs = rows.map { case (u, eid, ts, item, v) =>
      Ev(u, eid, ts, item, if (v > 100) 1 else 0)
    }
    val (early, late) = evs.partition(e => e.ts % 30 != 0)
    mem.addData(early: _*)
    q.processAllAvailable()
    mem.addData(late: _*)  // within-frame late arrivals must merge
    q.processAllAvailable()
    q.stop()
    val streamedSnap = spark.table("rt_snap")
      .withColumn("__mx", max(col("ver")).over(
        Window.partitionBy("user_id")))
      .filter(col("ver") === col("__mx"))
      .select(col("user_id"), col("item"), col("rank_ppm"))

    // --- the same q432 pipeline, batch-derived vs stream-fed rank
    // state; identical responses, row for row.
    val batch = Flagship.recommendFrom(spark, events, embeddings)
      .collect().map(_.toSeq).toSeq
    val streamFed = Flagship.recommendFrom(spark, events, embeddings,
        Some(streamedSnap))
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty, "fixture must produce recommendations")
    assert(streamFed == batch,
      s"stream-fed response diverged:\n  batch=$batch\n  stream=$streamFed")
  }
}
