package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamJoin

/** Stream-stream attribution join: clicks match impressions within the
  * horizon on the same key; outside-horizon clicks match nothing.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  // minutes offset above a nonzero base so event times sit well above
  // the initial (epoch) watermark
  private def ts(min: Long) = new Timestamp((600000L + min) * 60000L)

  test("clicks join the preceding impression within the horizon only") {
    implicit val sq = spark.sqlContext
    val impMem = MemoryStream[(Long, Timestamp)]
    val clkMem = MemoryStream[(Long, Timestamp)]
    val imp = impMem.toDS().toDF("user_id", "imp_ts")
    val clk = clkMem.toDS().toDF("user_id", "clk_ts")
    val out = StreamJoin.attribute(imp, clk, "user_id", "imp_ts", "clk_ts",
      "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()

    impMem.addData((1L, ts(0)), (2L, ts(0)))
    q.processAllAvailable()   // impressions buffer first (separate batch)
    // user 1 clicks inside the horizon; user 2 clicks 30 min later (outside)
    clkMem.addData((1L, ts(5)), (2L, ts(30)))
    q.processAllAvailable()
    val matched = spark.table("attr_out")
      .select("user_id").as[Long].collect().toSeq
    assert(matched == Seq(1L), s"got $matched")

    // a second impression for user 2, clicked within horizon → matches
    impMem.addData((2L, ts(31)))
    q.processAllAvailable()
    clkMem.addData((2L, ts(35)))
    q.processAllAvailable()
    assert(spark.table("attr_out").count() == 2)
    q.stop()
  }
}
