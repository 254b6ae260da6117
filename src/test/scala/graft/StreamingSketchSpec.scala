package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.SketchOps
import graft.streaming.StreamingSketch

/** Stream-built CMS counters must equal the batch sketch of the same
  * prefix — the merge-by-addition property that makes sketches
  * interchangeable between the batch and streaming layers.
  */
class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  test("streaming CMS counters equal the batch sketch after each batch") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    val out = StreamingSketch.cmsCounters(mem.toDS().toDF("k"), "k")
    val q = out.writeStream.format("memory").queryName("cms_out")
      .outputMode("complete").start()

    def batchSketch(keys: Seq[String]): Map[(Long, Long), Long] =
      SketchOps.cmsBucketed(keys.toDF("k"), "k", 4, 64)
        .groupBy("__d", "__b").count()
        .as[(Int, Long, Long)].collect()
        .map { case (d, b, c) => (d.toLong, b) -> c }.toMap

    def streamSketch(): Map[(Long, Long), Long] =
      spark.table("cms_out").as[(Int, Long, Long)].collect()
        .map { case (d, b, c) => (d.toLong, b) -> c }.toMap

    val batch1 = Seq("hot", "hot", "hot", "a", "b", "c")
    mem.addData(batch1: _*)
    q.processAllAvailable()
    assert(streamSketch() == batchSketch(batch1))

    // incremental: a second micro-batch ADDS into the same counters
    val batch2 = Seq("hot", "d", "e", "a")
    mem.addData(batch2: _*)
    q.processAllAvailable()
    assert(streamSketch() == batchSketch(batch1 ++ batch2))
    q.stop()
  }
}
