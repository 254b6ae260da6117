package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables — the co-located-join primitive for 100 TB fact
  * tables: two tables bucketed (and sorted) on the same key with the
  * same bucket count join with NO exchange on either side, because the
  * physical layout already satisfies the join's distribution
  * requirement. The shuffle is paid once at write time, then amortized
  * over every downstream join/aggregation on that key (events by
  * user_id, lineitem by orderkey — exactly the keys every PIT window
  * and enrichment join in this engine uses).
  *
  * Verified in BucketingSpec: a bucketed self-join plans zero
  * ShuffleExchange operators.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
