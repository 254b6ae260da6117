package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.operators.JoinOps.intervalOverlapJoin]]:
  * activity intervals arrive on a stream and every same-key pair whose
  * closed spans [lo, hi] intersect is emitted once, as soon as both
  * sides are present.
  *
  * State stays bounded by the standard stream-stream recipe: both
  * sides carry a watermark on their START time, and the join condition
  * includes `lo_b ≥ lo_a − maxSpan` — valid because interval LENGTH is
  * capped at `maxSpan` (the caller's contract, the streaming analogue
  * of the batch operator's bin-width assumption): any overlapping pair
  * satisfies lo_b ≥ lo_a − span_b ≥ lo_a − maxSpan, so the bound is
  * output-neutral while giving the state store an eviction horizon.
  * Rows older than watermark + maxSpan are dropped from state.
  *
  * Emits (key, id_a, id_b, overlap) with id_a < id_b; `overlap` in
  * microseconds, identical to the batch operator's arithmetic — the
  * parity spec holds batch ≡ stream on matured data.
  */
object StreamingIntervalJoin {

  def overlaps(intervals: DataFrame, keyCol: String, idCol: String,
               loCol: String, hiCol: String, maxSpan: String,
               watermarkDelay: String): DataFrame = {
    val a = intervals.select(col(keyCol).as("__k"), col(idCol).as("id_a"),
        col(loCol).as("__lo_a"), col(hiCol).as("__hi_a"))
      .withWatermark("__lo_a", watermarkDelay)
    val b = intervals.select(col(keyCol).as("__kb"), col(idCol).as("id_b"),
        col(loCol).as("__lo_b"), col(hiCol).as("__hi_b"))
      .withWatermark("__lo_b", watermarkDelay)
    a.join(b,
        col("__k") === col("__kb") &&
          col("__lo_b") >= col("__lo_a") - expr(s"INTERVAL $maxSpan") &&
          col("__lo_a") >= col("__lo_b") - expr(s"INTERVAL $maxSpan") &&
          col("__lo_b") <= col("__hi_a") && col("__lo_a") <= col("__hi_b"))
      // the id inequality stays OUTSIDE the join condition: the
      // symmetric hash join planner only splits time/key predicates,
      // and a non-time inequality inside the condition fails to plan
      .filter(col("id_a") < col("id_b"))
      .select(col("__k").as(keyCol), col("id_a"), col("id_b"),
        (unix_micros(least(col("__hi_a"), col("__hi_b"))) -
          unix_micros(greatest(col("__lo_a"), col("__lo_b"))))
          .as("overlap"))
  }
}
