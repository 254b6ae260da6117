package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the continuous-ingest form of the batch
  * exact dedup (DedupOps.exactDedup / q24): drop any event whose
  * content fingerprint was already seen within the watermark horizon.
  *
  * `dropDuplicatesWithinWatermark` keeps one state row per distinct
  * fingerprint and EVICTS it once the watermark passes (ts + lateness),
  * so state is bounded by the dedup horizon's distinct-key count — the
  * property that lets a firehose ingest run forever. (Unbounded
  * `dropDuplicates` would grow state monotonically; cross-horizon
  * duplicates are the batch layer's job.)
  */
object StreamingDedup {

  /** Dedup a stream on md5(content) within the watermark horizon. */
  def dedupByFingerprint(stream: DataFrame, tsCol: String, contentCol: String,
                         lateness: String): DataFrame =
    stream.withColumn("__fp", md5(col(contentCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
}
