package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.RelationalOps
import graft.streaming.StatefulPit
import graft.streaming.StatefulPit.Ev

/** ST1 — streaming PIT equals the batch W2 window, with state bounded at
  * 10 rows per user and carried across micro-batches.
  */
class StreamingPitSpec extends SparkSpec {
  import spark.implicits._

  test("transformWithState (V2) PIT equals V1 and batch, state in RocksDB ListState") {
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Ev]
      val out = graft.streaming.StatefulPitV2(mem.toDS(), frameLen = 10)
      val q = out.writeStream.format("memory").queryName("pit_v2")
        .outputMode("append").start()
      val evs = (0 until 15).map(i =>
        Ev(1L, i.toLong, i.toLong * 1000, if (i % 3 == 0) 1 else 0)) ++
        (0 until 6).map(i =>
          Ev(2L, 100L + i, i.toLong * 500, i % 2))
      mem.addData(evs.take(9): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(9): _*)   // ListState must carry across batches
      q.processAllAvailable()
      val streamed = spark.table("pit_v2")
        .orderBy("event_id").select("event_id", "pit_imp", "pit_clk")
        .as[(Long, Long, Long)].collect().toSeq
      q.stop()
      val batch = RelationalOps.pitWindow(
          evs.toDF(), "user_id", Seq(col("ts"), col("event_id")), "label", 10)
        .orderBy("event_id").select("event_id", "pit_imp", "pit_clk")
        .as[(Long, Long, Long)].collect().toSeq
      assert(streamed == batch)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming PIT counters match batch pitWindow across micro-batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StatefulPit(mem.toDS(), frameLen = 10)
    val q = out.writeStream.format("memory").queryName("pit_out")
      .outputMode("append").start()

    val evs = (0 until 15).map(i =>
      Ev(1L, i.toLong, i.toLong * 1000, if (i % 3 == 0) 1 else 0))
    mem.addData(evs.take(7): _*)      // batch 1
    q.processAllAvailable()
    mem.addData(evs.drop(7): _*)      // batch 2 — state must carry over
    q.processAllAvailable()

    val streamed = spark.table("pit_out")
      .orderBy("event_id").select("event_id", "pit_imp", "pit_clk")
      .as[(Long, Long, Long)].collect().toSeq
    q.stop()

    val batch = RelationalOps.pitWindow(
        evs.toDF(), "user_id", Seq(col("ts"), col("event_id")), "label", 10)
      .orderBy("event_id").select("event_id", "pit_imp", "pit_clk")
      .as[(Long, Long, Long)].collect().toSeq

    assert(streamed == batch)
  }

  test("streaming state stays bounded at frameLen rows per user") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StatefulPit(mem.toDS(), frameLen = 3)
    val q = out.writeStream.format("memory").queryName("pit_bounded")
      .outputMode("append").start()
    mem.addData((0 until 50).map(i => Ev(7L, i.toLong, i.toLong, 1)): _*)
    q.processAllAvailable()
    val last = spark.table("pit_bounded").orderBy(desc("event_id"))
      .select("pit_imp").as[Long].head()
    q.stop()
    assert(last == 3L)   // frame capped, not 49
  }
}
