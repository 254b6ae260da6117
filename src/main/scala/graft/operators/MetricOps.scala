package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Metric + skew-handling operators.
  *
  * A9 distributed ROC-AUC: the rank-formula AUC
  * (Σ rank⁺ − P(P+1)/2) / (P·N) needs a GLOBAL rank, but a global
  * `row_number()` window is a single-partition bottleneck. Here the
  * rank decomposes into
  *   rank(x) = (# rows with smaller score)  [broadcast join on the
  *             tiny per-score histogram]
  *           + (row_number within this score's partition, tie-broken
  *             by id)  [a window partitioned BY SCORE — fully parallel]
  * which is exactly the tie-broken global rank, with no single-reducer
  * stage. The per-score histogram is |distinct scores| rows — the only
  * "global" object, and it broadcasts.
  */
object MetricOps {

  /** Global tie-broken rank per row, distributed (see object doc).
    * Output adds `r` = 1-based rank by (score, tiebreak).
    */
  def globalRank(df: DataFrame, scoreCol: String, tieCol: String): DataFrame = {
    val hist = df.groupBy(col(scoreCol)).agg(count(lit(1)).as("__n"))
    val below = hist
      .withColumn("__below",
        coalesce(sum(col("__n")).over(
          Window.orderBy(col(scoreCol))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(scoreCol), col("__below"))
    val within = Window.partitionBy(col(scoreCol)).orderBy(col(tieCol))
    df.join(broadcast(below), Seq(scoreCol))
      .withColumn("r", col("__below") + row_number().over(within))
      .drop("__below")
  }

  /** A9: rank-formula ROC-AUC with deterministic tiebreak — one
    * aggregate over the distributed ranks.
    */
  def auc(df: DataFrame, labelCol: String, scoreCol: String,
          tieCol: String, roundTo: Int = 6): DataFrame =
    globalRank(df, scoreCol, tieCol).agg(
      round(
        (sum(when(col(labelCol) === 1, col("r")).otherwise(0L)).cast("double")
          - sum(col(labelCol)).cast("double") * (sum(col(labelCol)) + 1) / 2)
          / (sum(col(labelCol)).cast("double")
            * (count(lit(1)) - sum(col(labelCol)))), roundTo).as("auc"))

  /** Two-phase salted aggregation for skewed keys: phase 1 aggregates
    * on (key, salt) — spreading a hot key over `saltBuckets` reducers —
    * phase 2 merges the partials per key. Count/sum decompose exactly;
    * result is identical to a direct groupBy. (Spark's partial
    * aggregation already does this when the map side sees the hot key,
    * but a skewed SHUFFLE key after a join does not benefit — this
    * does.)
    */
  def saltedCountSum(df: DataFrame, keyCol: String, valueCol: String,
                     saltBuckets: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(col(valueCol)), lit(saltBuckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__c"), sum(col(valueCol)).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum(col("__c")).as("cnt"), sum(col("__s")).as("sum"))

  /** A7 at scale: HLL-based distinct counts for the constant-prune
    * check — at 100 TB the exact `countDistinct` shuffle is unnecessary
    * when the question is only "is cardinality 1?" (rsd 5% cannot
    * confuse 1 with 2).
    */
  def approxConstPruneReport(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.sorted.map { c =>
      df.agg(
        lit(c).as("col_name"),
        approx_count_distinct(col(c)).as("n_distinct_approx"),
        (approx_count_distinct(col(c)) > 1).cast("int").as("keep"))
    }.reduce(_.unionAll(_))
}
