package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming drift monitor — the continuous form of the batch PSI
  * family (MetricOps.psi / psiByPeriod, q106/q318): a running value
  * histogram maintained by the streaming aggregation state store
  * (state = ≤ nBins rows forever, the same bounded-state argument as
  * StreamingSketch), snapshotted in complete mode and scored against
  * a frozen baseline histogram with MetricOps.psiFromCounts.
  *
  * StreamingDriftSpec proves the two invariants that make this
  * deployable: the stream snapshot equals the batch histogram of the
  * same prefix after every micro-batch, and the PSI of an
  * identically-distributed prefix is exactly 0 while a shifted one
  * scores positive.
  */
object StreamingDrift {

  /** Running per-bin value counts for a stream: one row per bin id
    * with the running count `n`. Complete mode gives a directly
    * usable ≤ nBins-row snapshot; update mode emits changed bins only
    * (keep the latest row per bin).
    */
  def valueBins(stream: DataFrame, valueCol: String, binWidth: Double,
                nBins: Int): DataFrame =
    stream.select(least(floor(col(valueCol) / binWidth), lit(nBins - 1))
        .cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
}
