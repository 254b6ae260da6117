package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table sink/source — the storage-level co-location tool the
  * rest of the library assumes for repeated fact-fact joins.
  *
  * A join or aggregation on the bucket key of a bucketed table needs NO
  * exchange: the scan itself reports `HashPartitioning(key, nBuckets)`,
  * so Catalyst drops the shuffle on that side (both sides, when the
  * bucket counts match). At 100 TB that converts every recurring
  * lineitem⋈orders-style join from two full-data shuffles into a
  * zero-exchange sort-merge — the single biggest recurring cost in a
  * star-schema pipeline. `sortBy` additionally pre-sorts each bucket
  * file so the merge side skips its sort when files-per-bucket is 1.
  *
  * Point lookups on the bucket key prune to one bucket
  * (`SelectedBucketsCount: 1 out of N` in the scan) — the poor man's
  * index for the serving-snapshot tables (reference:
  * `offline_to_online/recall/s1_user_to_redis.py:17-30` keys by user;
  * here the same keyed layout is a bucketed parquet table).
  *
  * Bucket count sizing at scale: total size / nBuckets should land near
  * one HDFS-block-ish file per bucket per writing task — pick a power
  * of two so a later `spark.sql.sources.v2.bucketing`-style re-bucket
  * can coalesce pairs of buckets instead of rewriting.
  */
object BucketedTables {

  /** Write `df` as an EXTERNAL bucketed (and per-bucket sorted) parquet
    * table at `path`. External so the data outlives the in-memory
    * catalog entry — a fresh session re-registers with the same DDL.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int, path: String): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Read a bucketed table back (catalog lookup — the bucket spec rides
    * in the table metadata, which is what makes the scan report its
    * HashPartitioning to the planner).
    */
  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
