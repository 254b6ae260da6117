package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General point-in-time (as-of) join — J4 in its full form: each left
  * row is enriched with the payload of the most recent right row with
  * the same key and rightTs ≤ leftTs (inclusive).
  *
  * The reference only ever needs the windowed specialization
  * (pitWindow/pitTermFeatures compute features in place), but a
  * feature-store backfill needs the general operator Spark lacks.
  * Composed from built-ins per the preference order (SURVEY §7.4):
  * UNION the two sides on (key, ts) with a side tag ordering right
  * rows BEFORE coincident left rows, then one `last(payload,
  * ignoreNulls)` running window carries the newest right payload
  * forward onto every left row. One shuffle on the key; no range
  * join, no per-key materialization; ties among right rows are
  * resolved by a caller-supplied tiebreak column.
  *
  * Matches DuckDB's native `ASOF LEFT JOIN` semantics (the q43
  * oracle).
  */
object AsOfJoin {

  /** Native physical form: plans through the built-in `Join` logical
    * node with the `graft_asof` marker conjunct, which
    * [[graft.plans.AsOfJoinStrategy]] turns into the sort-merge
    * [[graft.plans.AsOfJoinExec]] (O(1) merge memory per partition vs
    * the window form's running frame). Column names must be disjoint —
    * rename the right side first, as with any Spark join.
    *
    * @param joinType "inner" (drop unmatched left rows — DuckDB
    *                 `ASOF JOIN`) or "left" (null-extend them)
    */
  def exec(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTsCol: String, rightTsCol: String,
           joinType: String = "inner"): DataFrame = {
    graft.plans.GraftExtensions.register(left.sparkSession)
    // Qualified unresolved refs, not left(k) === right(k): when both
    // sides derive from the same scan those resolve to ONE attribute —
    // a trivially-true predicate (WARN + heuristic self-join fix-up).
    // The subquery aliases keep attribute ids, so callers can still
    // disambiguate output columns via left("c") / right("c").
    val l = left.alias("__asof_l")
    val r = right.alias("__asof_r")
    val cond = keyCols.map(k =>
        col(s"__asof_l.$k") === col(s"__asof_r.$k")).reduce(_ && _) &&
      call_function("graft_asof",
        col(s"__asof_l.$leftTsCol"), col(s"__asof_r.$rightTsCol"))
    l.join(r, cond, joinType)
  }

  /** @param payloadCols right-side columns to carry onto left rows
    * @param rightTieCol deterministic order among right rows sharing
    *                    (key, ts) — the later one wins
    */
  def apply(left: DataFrame, right: DataFrame, keyCol: String,
            leftTsCol: String, rightTsCol: String,
            payloadCols: Seq[String], rightTieCol: String): DataFrame = {
    val payload = struct(payloadCols.map(col): _*)
    val r = right.select(
      col(keyCol), col(rightTsCol).as("__ts"), lit(0).as("__side"),
      col(rightTieCol).as("__rtie"), payload.as("__payload"))
    val leftCols = left.columns
    val l = left.select(
      (Seq(col(keyCol), col(leftTsCol).as("__ts"), lit(1).as("__side"),
        lit(null).cast(r.schema("__rtie").dataType).as("__rtie"),
        lit(null).cast(r.schema("__payload").dataType).as("__payload")) ++
        leftCols.filterNot(_ == keyCol).map(c => left(c).as(s"__l_$c"))): _*)
    val unioned = r
      .select((l.columns.take(5).map(col) ++
        leftCols.filterNot(_ == keyCol).map(c =>
          lit(null).cast(left.schema(c).dataType).as(s"__l_$c"))): _*)
      .unionByName(l)
    // right rows (__side 0) sort before coincident left rows → inclusive ≤;
    // among right rows with equal ts the larger tiebreak sorts last → wins.
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__ts"), col("__side"), col("__rtie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = unioned.withColumn("__asof", last(col("__payload"), true).over(w))
    attached.filter(col("__side") === 1)
      .select((Seq(col(keyCol), col("__ts").as(leftTsCol)) ++
        leftCols.filterNot(c => c == keyCol || c == leftTsCol)
          .map(c => col(s"__l_$c").as(c)) ++
        payloadCols.map(c => col(s"__asof.$c").as(c))): _*)
  }
}
