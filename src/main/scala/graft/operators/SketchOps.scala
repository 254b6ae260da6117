package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distinct-count sketching. Spark's own `approx_count_distinct` (HLL++)
  * is the zero-thought default, but its estimate is engine-private — no
  * cross-engine oracle can check it. The KMV (k-minimum-values / bottom-k)
  * sketch here is built on md5, so the estimate itself is a DETERMINISTIC
  * function of the input set: portable across engines, reproducible
  * across runs/partitionings, and mergeable (union of bottom-k sets →
  * bottom-k) — the property that matters when sketches are combined
  * across 1000 executors or across daily partitions.
  */
object SketchOps {

  /** KMV distinct estimate per group: hash each value to a uniform
    * 48-bit integer (md5 prefix), keep the k smallest distinct hashes,
    * and estimate |distinct| ≈ (k−1) · 2^48 / h_(k) where h_(k) is the
    * k-th smallest hash. Standard error ≈ 1/√(k−2) (~13% at k=64).
    * Groups with fewer than k distinct hashes report their exact count
    * (the sketch is exact below its capacity).
    *
    * Output: group, exact_distinct (for calibration), kmv_est (rounded
    * 4 dp), rel_err (rounded 4 dp, from the rounded estimate).
    *
    * Determinism: the k-th smallest of a set is order-independent;
    * (k−1)·2^48 is exact in a double (< 2^53) and the estimate is one
    * division. Scale: the distinct-hash dedup is the only full shuffle;
    * the per-group bottom-k selection here uses a row_number window
    * (oracle-friendly), while at 100 TB the same selection runs as a
    * bounded O(k) map-side aggregation (TopKAggregator with negated
    * keys) so the sort never sees whole groups.
    */
  def kmvDistinct(df: DataFrame, groupCol: String, valCol: String,
                  k: Int): DataFrame = {
    require(k >= 3, "KMV needs k >= 3 for a finite-variance estimate")
    val dh = df.select(col(groupCol),
        conv(substring(md5(col(valCol).cast("string")), 1, 12), 16, 10)
          .cast("long").as("__u"))
      .distinct()
    val kth = dh.withColumn("__rn", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("__u"))))
      .filter(col("__rn") === k)
      .select(col(groupCol), col("__u").as("__uk"))
    val exact = dh.groupBy(col(groupCol))
      .agg(count(lit(1)).as("exact_distinct"))
    exact.join(kth, Seq(groupCol), "left")
      .select(col(groupCol), col("exact_distinct"),
        when(col("__uk").isNull, col("exact_distinct").cast("double"))
          .otherwise(round(lit((k - 1).toDouble * (1L << 48).toDouble) /
            col("__uk").cast("double"), 4)).as("kmv_est"))
      .withColumn("rel_err",
        round(abs(col("kmv_est") - col("exact_distinct")) /
          col("exact_distinct"), 4))
  }
}
