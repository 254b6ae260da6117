package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.SketchOps

/** Streaming HyperLogLog — the continuous form of the batch sketch
  * (SketchOps.hllDistinct / q154). Registers are a running grouped MAX
  * over the same md5-derived (bucket, rho) expansion the batch build
  * uses: state is at most |groups|·2^p rows no matter how much data
  * flows through, because rho-max absorbs duplicates — the streaming
  * aggregation never needs the distinct() pass the batch side runs for
  * its exact-count twin.
  *
  * A register snapshot taken after any prefix of the stream equals the
  * batch registers of that prefix (StreamingHllSpec asserts it), so
  * estimates from either build are interchangeable — the same
  * mergeability that lets 1000 executors or daily partitions combine
  * sketches by max.
  */
object StreamingHll {

  /** Running HLL registers for a stream: one row per (group, bucket
    * `__b`) with the running max rho `__mr`. Sink in COMPLETE mode for
    * a directly-usable snapshot (≤ |groups|·2^p rows, so complete mode
    * is cheap); update mode also works but emits only changed
    * registers, so a consumer must keep the LATEST row per (group,
    * __b). Feed a snapshot to SketchOps.hllEstimate for the estimate.
    */
  def registers(stream: DataFrame, groupCol: String, valCol: String,
                p: Int = 8): DataFrame =
    SketchOps.hllRegisters(
      stream.select(col(groupCol), SketchOps.hllHash(valCol).as("__u")),
      groupCol, "__u", p)
}
