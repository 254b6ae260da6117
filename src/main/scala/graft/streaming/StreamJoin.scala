package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream join — the attribution op: match each
  * click to the impression that preceded it within `horizon` on the
  * same key (online/main's request-response pairing, as streams).
  *
  * Both sides carry watermarks and the join has a bounded event-time
  * range condition, which is exactly what lets Spark EVICT buffered
  * rows: an impression older than (watermark − horizon) can never match
  * a future click, so per-key state is bounded by the horizon — the
  * invariant that keeps a stream-stream join running forever at
  * cluster scale. Without the time-range condition, state grows
  * without bound and the job eventually OOMs; this operator makes the
  * condition part of the API instead of a caller obligation.
  */
object StreamJoin {

  /** Inner-join clicks to the impressions they follow within `horizon`.
    *
    * @param impressions stream with (keyCol, impTsCol) — left/buffered side
    * @param clicks      stream with (keyCol, clkTsCol)
    * @param horizon     max impression→click delay, e.g. "10 minutes"
    * @param lateness    watermark delay for both sides
    */
  def attribute(impressions: DataFrame, clicks: DataFrame, keyCol: String,
                impTsCol: String, clkTsCol: String,
                horizon: String, lateness: String): DataFrame = {
    val imp = impressions.withWatermark(impTsCol, lateness)
    val clk = clicks.withWatermark(clkTsCol, lateness)
    imp.join(clk,
      imp(keyCol) === clk(keyCol) &&
        clk(clkTsCol) >= imp(impTsCol) &&
        clk(clkTsCol) <= imp(impTsCol) + expr(s"INTERVAL $horizon"),
      "inner")
      .drop(clk(keyCol))
  }
}
