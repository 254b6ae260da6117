package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All engine code scans through here so reads stay uniform: Parquet at
  * rest (columnar, splittable), explicit projections left to Catalyst's
  * column pruning, and `events.ts` normalized from TIMESTAMP_NTZ to the
  * session-TZ TIMESTAMP (the harness pins UTC) so epoch arithmetic
  * (`unix_micros`) is available for window/interval logic.
  *
  * At 100 TB these tables would be partitioned (events by day, lineitem
  * by shipdate); the loaders take a directory so partition-pruned paths
  * drop in without touching operator code.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Events stream table. The parquet `ts` is TIMESTAMP(NANOS), which
    * Spark's parquet reader rejects; read it as raw nanos
    * (`nanosAsLong`) and truncate to a microsecond session-TZ TIMESTAMP
    * with exact integer division — bit-identical to how DuckDB coerces
    * the same column to its microsecond TIMESTAMP, so cross-engine
    * ordering and interval arithmetic agree.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Owned sessions (Verify/Bench/Pipeline/specs) set nanosAsLong in
    // their builders; this guard covers only EXTERNAL sessions (the
    // harness smoke check constructs its own) without re-mutating
    // session config on every read.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (!spark.conf.getOption(key).contains("true")) spark.conf.set(key, "true")
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
