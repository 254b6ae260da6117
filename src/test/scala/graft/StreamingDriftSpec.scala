package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.MetricOps
import graft.streaming.StreamingDrift

/** Stream-built value histograms must equal the batch histogram of
  * the same prefix after every micro-batch, and the PSI scored off a
  * snapshot must read 0 for an identical distribution and positive
  * after a shift — the pair of invariants that make the streaming
  * drift monitor interchangeable with the batch PSI family.
  */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  test("streaming value bins equal the batch histogram per batch; " +
    "snapshot PSI is 0 on match and positive after a shift") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Double]
    val out = StreamingDrift.valueBins(mem.toDS().toDF("v"), "v",
      binWidth = 50.0, nBins = 10)
    val q = out.writeStream.format("memory").queryName("drift_bins")
      .outputMode("complete").start()

    def batchBins(vs: Seq[Double]): Map[Int, Long] =
      StreamingDrift.valueBins(vs.toDF("v"), "v", 50.0, 10)
        .as[(Int, Long)].collect().toMap
    def streamBins(): Map[Int, Long] =
      spark.table("drift_bins").as[(Int, Long)].collect().toMap

    val base = (0 until 100).map(i => (i % 4) * 50.0 + 1)
    mem.addData(base: _*)
    q.processAllAvailable()
    assert(streamBins() == batchBins(base))

    // identical distribution so far → PSI exactly 0
    val baseline = base.toDF("v")
      .select((org.apache.spark.sql.functions.floor(
        org.apache.spark.sql.functions.col("v") / 50)).cast("int")
        .as("bin"))
      .groupBy("bin").count().withColumnRenamed("count", "n")
    val psi0 = MetricOps.psiFromCounts(baseline,
      spark.table("drift_bins"), nBins = 10).collect()(0)
    assert(psi0.getAs[Double]("psi") == 0.0)

    // a shifted second batch moves mass into new bins → PSI > 0,
    // and the snapshot still equals the batch histogram of the prefix
    val shifted = (0 until 100).map(i => ((i % 4) + 4) * 50.0 + 1)
    mem.addData(shifted: _*)
    q.processAllAvailable()
    assert(streamBins() == batchBins(base ++ shifted))
    val psi1 = MetricOps.psiFromCounts(baseline,
      spark.table("drift_bins"), nBins = 10).collect()(0)
    assert(psi1.getAs[Double]("psi") > 0.1)
    assert(psi1.getAs[Long]("n_actual") == 200L)
    q.stop()
  }
}
