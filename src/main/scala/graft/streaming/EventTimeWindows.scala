package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with watermarks — the Structured
  * Streaming idiom for the reference's time-bucketed behavior counters
  * (SURVEY §2.9 note: "watermark on ts with late-data drop would be the
  * Structured Streaming idiom").
  *
  * State per (key, window) is one partial aggregate; the watermark lets
  * Spark drop finalized windows, so state is bounded by
  * |active keys| × |open windows| regardless of stream length — the
  * property that makes this run forever on a cluster.
  */
object EventTimeWindows {

  /** Tumbling per-key imp/clk counts: window(ts, dur) × key →
    * count + sum(label). Append mode emits a window only once its end
    * passes the watermark (late events beyond `lateness` are dropped).
    */
  def tumblingCounts(events: DataFrame, tsCol: String, keyCol: String,
                     labelCol: String, duration: String,
                     lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), duration), col(keyCol))
      .agg(count(lit(1)).as("imp"),
        coalesce(sum(col(labelCol)), lit(0L)).as("clk"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col(keyCol), col("imp"), col("clk"))

  /** Sliding variant: the streaming analogue of the last-N behavior
    * profile (every `slide`, the trailing `duration` counts per key).
    */
  def slidingCounts(events: DataFrame, tsCol: String, keyCol: String,
                    labelCol: String, duration: String, slide: String,
                    lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), duration, slide), col(keyCol))
      .agg(count(lit(1)).as("imp"),
        coalesce(sum(col(labelCol)), lit(0L)).as("clk"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col(keyCol), col("imp"), col("clk"))
}
