package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.SketchOps
import graft.streaming.StreamingHll

/** Stream-built HLL registers must equal the batch registers of the
  * same prefix — rho-max absorbs duplicates, so the streaming build
  * needs no distinct() pass, and estimates from either build are
  * interchangeable.
  */
class StreamingHllSpec extends SparkSpec {
  import spark.implicits._

  test("streaming HLL registers equal batch registers; estimates agree") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val out = StreamingHll.registers(mem.toDS().toDF("g", "v"), "g", "v")
    val q = out.writeStream.format("memory").queryName("hll_out")
      .outputMode("complete").start()

    def batchRegs(rows: Seq[(String, String)]): Map[(String, Long), Int] =
      SketchOps.hllRegisters(
          rows.toDF("g", "v")
            .select(col("g"), SketchOps.hllHash("v").as("__u")),
          "g", "__u", 8)
        .as[(String, Long, Int)].collect()
        .map { case (g, b, r) => (g, b) -> r }.toMap

    def streamRegs(): Map[(String, Long), Int] =
      spark.table("hll_out").as[(String, Long, Int)].collect()
        .map { case (g, b, r) => (g, b) -> r }.toMap

    val batch1 = (1 to 400).map(i => ("a", s"x$i")) ++
      (1 to 50).map(i => ("b", s"y$i"))
    mem.addData(batch1: _*)
    q.processAllAvailable()
    assert(streamRegs() == batchRegs(batch1))

    // second micro-batch: duplicates merge by max, new values extend
    val batch2 = (300 to 700).map(i => ("a", s"x$i"))
    mem.addData(batch2: _*)
    q.processAllAvailable()
    assert(streamRegs() == batchRegs(batch1 ++ batch2))

    // the streamed snapshot estimates through the identical formula:
    // hllEstimate(stream registers) == hll_est from the batch build
    val est = SketchOps.hllEstimate(spark.table("hll_out"), "g", 8)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    val batchEst = SketchOps.hllDistinct(
        (batch1 ++ batch2).toDF("g", "v"), "g", "v", 8)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(est == batchEst)
    q.stop()
  }
}
