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

  /** Streaming sessionization: built-in `session_window` merges events
    * within `gap` of each other per key — the streaming counterpart of
    * the batch lag+cumsum sessionizer (TextOps.sessionize / q22). A
    * session closes (and is emitted, in append mode) once the watermark
    * passes its end; state per open session is one window struct.
    */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String,
                    gap: String, lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col(keyCol), col("n_events"))

  /** Stream-static enrichment: join the event stream against a static
    * dimension (the serving-snapshot/entity table); no state
    * accumulates — the streaming form of the J5 key-lookup join.
    * `broadcastDim` forces the hint for known-small dims; leave false
    * for large dimensions so Spark's size-based planning decides.
    */
  def enrich(stream: DataFrame, dim: DataFrame, keyCols: Seq[String],
             broadcastDim: Boolean = false): DataFrame = {
    val d = if (broadcastDim) org.apache.spark.sql.functions.broadcast(dim) else dim
    stream.join(d, keyCols, "left")
  }

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
