package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the incremental-dedup admit filter
  * ([[graft.operators.DedupOps.incrementalDedup]]): admit only
  * streamed documents whose content fingerprint is absent from a
  * STATIC fingerprint store (yesterday's accumulated corpus, one md5
  * per historical doc).
  *
  * The store joins as a STREAM-STATIC left-anti join — Spark plans it
  * per micro-batch with no state store and no watermark, so the
  * stream scales to any rate the source sustains and the store
  * refreshes by query restart (the same frozen-artifact serving
  * pattern as [[StreamingScore]]). In-stream duplicates (two copies
  * arriving in the SAME stream) are deliberately out of scope here:
  * that is [[StreamingDedup]]'s watermark-bounded job, and the two
  * compose — `streamingDedup ∘ admitAgainstStore` — exactly like the
  * batch pipeline's keep-first-then-anti-join.
  *
  * Determinism contract (StreamingIncDedupSpec): for the same rows,
  * the admitted (id, fp) set equals the batch op's output modulo the
  * batch op's in-batch keep-min-id step.
  */
object StreamingIncDedup {

  /** Admit streamed rows absent from the store: output (idCol, fp). */
  def admit(stream: DataFrame, idCol: String, textCol: String,
            store: DataFrame, fpCol: String): DataFrame =
    stream
      .select(col(idCol), md5(col(textCol)).as("fp"))
      .join(store.select(col(fpCol).as("fp")).distinct(), Seq("fp"),
        "left_anti")
      .select(col(idCol), col("fp"))
}
