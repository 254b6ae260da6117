package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-mixture construction for training corpora: given target source
  * proportions, compute the largest feasible sample and draw it
  * deterministically.
  *
  * The reference's pipelines fix their train/test mix by explicit
  * row-count splits (s1_data_split.py); at pre-training scale the same
  * need appears as "30% web, 20% code, …" source weighting. The whole
  * computation is relational:
  *
  *  1. per-source counts n_s — one hash aggregation;
  *  2. the largest total T such that every source can supply its share:
  *     T = min_s(n_s / p_s) — an aggregate over |sources| rows;
  *  3. per-source keep rate p_s·T / n_s — broadcast back (|sources|
  *     rows, so the join with the corpus is a broadcast hash join, no
  *     shuffle of the data);
  *  4. membership: keep row iff u(id) < rate, where u(id) is the first
  *     8 hex chars of md5(id) scaled to [0,1) — deterministic,
  *     engine-portable, and stable under re-partitioning (no RNG, no
  *     row order dependence).
  *
  * Rates are rounded to 6 dp BEFORE the membership guard so the same
  * rows are selected in any IEEE-double engine.
  */
object MixtureOps {

  /** The deterministic membership draw shared by every sampler here:
    * first 8 hex chars of md5(id) scaled to [0,1). Stable under
    * re-runs, re-partitioning, and engines (the DuckDB twin is
    * `('0x' || substr(md5(id::VARCHAR), 1, 8))::BIGINT / 2^32`).
    */
  def membership(idCol: String): org.apache.spark.sql.Column =
    conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Per-source sampling summary: n_docs, keep rate, kept count, and a
    * kept-id checksum (order-independent). Sources absent from
    * `weights` are excluded from the mixture.
    */
  def mixtureSample(df: DataFrame, srcCol: String, idCol: String,
                    weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty, "no mixture weights given")
    val p = weights.foldLeft(lit(null).cast("double")) {
      case (acc, (s, w)) => when(col(srcCol) === s, lit(w)).otherwise(acc)
    }
    val weighted = df.withColumn("__p", p).filter(col("__p").isNotNull)
    val counts = weighted.groupBy(col(srcCol), col("__p"))
      .agg(count(lit(1)).as("n_docs"))
    val feasible = counts.agg(
      min(col("n_docs").cast("double") / col("__p")).as("__t"))
    val rates = counts.crossJoin(broadcast(feasible))
      .select(col(srcCol), col("n_docs"),
        round(col("__p") * col("__t") / col("n_docs"), 6).as("rate"))
    val u = membership(idCol)
    val kept = weighted.join(broadcast(rates.select(col(srcCol), col("rate"))),
        Seq(srcCol))
      .filter(u < col("rate"))
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_keep"),
        sum(col(idCol)).cast("long").as("id_sum"))
    rates.join(kept, Seq(srcCol), "left")
      .select(col(srcCol), col("n_docs"), col("rate"),
        coalesce(col("n_keep"), lit(0L)).as("n_keep"),
        coalesce(col("id_sum"), lit(0L)).as("id_sum"))
  }

  /** Per-group quantile quality gate (the CCNet-style prune): keep rows
    * whose score is at or above their OWN group's `q`-quantile, so a
    * strict source never starves a permissive one. One tiny per-group
    * aggregation (exact interpolated percentile), broadcast back onto
    * the corpus — the data itself never shuffles. Thresholds are
    * rounded to 6 dp BEFORE the guard (cross-engine reproducibility).
    */
  def quantileGate(df: DataFrame, grpCol: String, idCol: String,
                   scoreCol: String, q: Double): DataFrame = {
    val thr = df.groupBy(col(grpCol)).agg(
      count(lit(1)).as("n_docs"),
      round(expr(s"percentile($scoreCol, $q)"), 6).as("thr"))
    val kept = df.join(broadcast(thr.select(col(grpCol), col("thr"))),
        Seq(grpCol))
      .filter(col(scoreCol) >= col("thr"))
      .groupBy(col(grpCol))
      .agg(count(lit(1)).as("n_keep"),
        sum(col(idCol)).cast("long").as("id_sum"))
    thr.join(kept, Seq(grpCol), "left")
      .select(col(grpCol), col("n_docs"), col("thr"),
        coalesce(col("n_keep"), lit(0L)).as("n_keep"),
        coalesce(col("id_sum"), lit(0L)).as("id_sum"))
  }
}
