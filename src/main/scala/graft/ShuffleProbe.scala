package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Shuffle-cost probe: drain named SparkEntry queries through the noop
  * sink with a stage listener attached and print, per query, one JSON
  * line `{"query":…,"sec":…,"shuffle_write_bytes":…,
  * "shuffle_write_records":…}`. The number that matters at 100 TB is
  * the BYTES a plan moves, not its local[32] latency — this is the
  * tool the BENCHLOG shuffle-bytes rows are measured with (e.g. the
  * round-11 gram-fingerprint migration, which leaves latency almost
  * flat at gate SFs but cuts the substring-dedup family's shuffled
  * bytes by the gram-string/16-byte-digest ratio).
  *
  * Usage: runMain graft.ShuffleProbe <sfDir> <query> [query ...]
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ShuffleProbe <sfDir> <query> [query ...]")
    val sfDir = args(0)
    val names = args.drop(1)
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bytes = new AtomicLong(0L)
    val records = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        }
      }
    })
    names.foreach { name =>
      bytes.set(0L); records.set(0L)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      // listener events drain asynchronously (the bus is private[spark],
      // so no waitUntilEmpty here); the queue empties in milliseconds —
      // a generous sleep keeps the counters per-query without touching
      // internals
      Thread.sleep(1500)
      println(f"""{"query":"$name","sec":$sec%.3f,""" +
        s""""shuffle_write_bytes":${bytes.get},""" +
        s""""shuffle_write_records":${records.get}}""")
    }
    spark.stop()
  }
}
