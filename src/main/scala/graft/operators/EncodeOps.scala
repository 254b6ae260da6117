package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Supervised feature-encoding operators for training-data prep —
  * the categorical-encoding family the reference handles with pandas
  * dict maps (recall/data_prepare/s1_feature_engi.py:25-52) generalized
  * to the smoothed forms a 100 TB pipeline needs.
  */
object EncodeOps {

  /** Smoothed target (mean) encoding: category → (n_pos + m·prior) /
    * (n + m), the standard empirical-Bayes shrinkage toward the global
    * prior that keeps rare categories from memorizing their labels.
    *
    * Determinism: n and n_pos are integer sums (order-independent); the
    * prior is computed in-plan and ROUNDED to 6 dp before use (the
    * shared-constant rule — both engines then divide by the identical
    * double), and the encoded value is one double division rounded at
    * the end.
    *
    * Scale: one hash aggregation on the category key + a 1-row
    * broadcast cross join for the prior. The encoder table is
    * |categories| rows — broadcast back onto the corpus for the
    * actual encode step, which stays shuffle-free.
    */
  def targetEncode(df: DataFrame, catCol: String, labelCol: String,
                   m: Double): DataFrame = {
    val prior = df.agg(
      round(sum(col(labelCol).cast("long")).cast("double") /
        count(lit(1)), 6).as("__prior"))
    df.groupBy(col(catCol))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol).cast("long")).as("n_pos"))
      .crossJoin(broadcast(prior))
      .select(col(catCol), col("n"), col("n_pos"),
        round((col("n_pos") + lit(m) * col("__prior")) / (col("n") + lit(m)), 6)
          .as("enc"))
  }
}
