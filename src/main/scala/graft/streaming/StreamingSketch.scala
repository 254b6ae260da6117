package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.SketchOps

/** Streaming Count-Min sketch — the continuous form of the batch
  * sketch (SketchOps.cmsHeavyHitters / q119). Counters are a running
  * grouped count over the same md5-sliced (row, bucket) expansion the
  * batch build uses, maintained incrementally by the streaming
  * aggregation state store: state is EXACTLY depth·width rows no
  * matter how much data flows through — the defining property of the
  * sketch carries over to the state store for free, because CMS
  * counters merge by addition and an update-mode streaming agg IS
  * incremental addition.
  *
  * A sketch snapshot taken after any prefix of the stream equals the
  * batch sketch of that prefix (StreamingSketchSpec asserts it), so
  * batch-built and stream-built sketches are interchangeable: probe
  * either with the batch estimator.
  */
object StreamingSketch {

  /** Running CMS counters for a stream: one row per (depth `__d`,
    * bucket `__b`) with the running count `c`. Sink in COMPLETE mode
    * for a directly-usable snapshot table (what StreamingSketchSpec's
    * batch-parity assertion runs against — depth·width rows, so
    * complete mode is cheap here); update mode also works but emits
    * only changed counters, so a consumer must keep the LATEST row per
    * (__d, __b) — a naive append-reader would see stale duplicates.
    */
  def cmsCounters(stream: DataFrame, keyCol: String, depth: Int = 4,
                  width: Int = 64): DataFrame =
    SketchOps.cmsBucketed(stream.select(col(keyCol)), keyCol, depth, width)
      .groupBy("__d", "__b")
      .agg(count(lit(1)).as("c"))
}
