package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering keys for
  * file-skipping at scale (the OPTIMIZE ZORDER analogue).
  *
  * At 100 TB the scan is the dominant cost, and min/max file statistics
  * prune files only when the data is clustered on the filter columns. A
  * Z-order (Morton) key interleaves the bits of several columns so that
  * `repartitionByRange(zCol).sortWithinPartitions(zCol)` co-locates rows
  * that are close in EVERY dimension — range predicates on any of the
  * interleaved columns then touch a bounded fraction of files, instead
  * of all files (which is what single-column sorting does to the other
  * columns).
  */
object LayoutOps {

  /** Morton/Z-value: interleave the low `bits` bits of x and y
    * (x in even positions, y in odd). Pure integer arithmetic —
    * the disjoint-bit terms are combined with `+` (equal to bitwise-or
    * here), which reproduces identically in any engine with shifts.
    */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _).cast("long")

  /** Per-Z-range clustering report: bucket rows by the top bits of the
    * z-value and report, per bucket, the row count and the min/max of
    * each source dimension. On well-clustered data every bucket spans a
    * narrow box in (x, y) — exactly the property that makes file-level
    * min/max stats selective. One hash aggregation on the bucket key.
    */
  def zOrderStats(df: DataFrame, xCol: String, yCol: String,
                  bits: Int, bucketShift: Int): DataFrame =
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .groupBy(shiftright(col("__z"), bucketShift).cast("long").as("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"))
}
