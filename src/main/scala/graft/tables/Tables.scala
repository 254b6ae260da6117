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
  /** Table-handle catalog: parquet footer inference costs ~80 ms per
    * read (it lists the directory and parses a footer, driver-side), a
    * schema-pinned read still pays ~8 ms of listing + relation
    * construction, and a reused analyzed DataFrame costs ~3 ms
    * (graft.Profile, re-measured r14) — and every query re-reads its
    * 1-3 base tables inside the bench's timed region, across 453
    * queries. A real deployment fronts these paths with a catalog
    * (Hive/Iceberg) whose table handle is O(1); this map is that
    * catalog: the schema is inferred once and the analyzed base
    * DataFrame (schema + file listing, i.e. the table METADATA) is
    * reused per (session, path). Only metadata is cached — a DataFrame
    * holds no rows, and every action still scans the parquet files.
    * Keyed by (session, path): test fixtures write to unique temp
    * dirs, so a path never changes schema within a JVM (the ADVICE r13
    * staleness caveat — latent, not live), and a DataFrame is only
    * ever replayed on the session that analyzed it.
    */
  private val handleCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    handleCache.computeIfAbsent((spark, path), kv =>
      kv._1.read.schema(kv._1.read.parquet(kv._2).schema).parquet(kv._2))
  }

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Events stream table, `ts` normalized to a microsecond session-TZ
    * TIMESTAMP whatever the file encodes. Generators have shipped two
    * physical types: TIMESTAMP(NANOS) — which Spark's reader rejects, so
    * it's read as raw nanos (`nanosAsLong`) and truncated with exact
    * integer division — and TIMESTAMP(MICROS) without UTC adjustment,
    * which lands as TIMESTAMP_NTZ and casts losslessly under the pinned
    * UTC session zone. Both normalizations are bit-identical to DuckDB's
    * coercion of the same column to its microsecond TIMESTAMP, so
    * cross-engine ordering and interval arithmetic agree.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Owned sessions (Verify/Bench/Pipeline/specs) set nanosAsLong in
    // their builders; this guard covers only EXTERNAL sessions (the
    // harness smoke check constructs its own) without re-mutating
    // session config on every read.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (!spark.conf.getOption(key).contains("true")) spark.conf.set(key, "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw // already a session-TZ TIMESTAMP
    }
  }
}
