package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** File sources/sinks (SURVEY §2.1).
  *
  * S1 — multi-char `::`-delimited, headerless text scan with declared
  * column names (ref: offline/preprocess/s1_data_split.py:10 reads
  * ratings.dat with sep="::" and engine="python"). Spark's CSV reader
  * does not take multi-char separators portably, so the reader is
  * text-scan + split + positional casts — fully codegen'd, splittable,
  * and pushdown-friendly on the resulting columns.
  *
  * S2 — charset-aware scan (ref: s2_term_trans.py:12, movies.dat in
  * ISO-8859-1): `.option("encoding", ...)` on the text source.
  *
  * S3/S4 — header CSV scan/sink with explicit schema (never inferred in
  * engine code).
  *
  * S6 — KV artifact tables: the reference exchanges pickled dicts
  * between stages (s2_term_trans.py:34,62-63); here every artifact is a
  * keyed parquet table with Array/Map columns — splittable, schema'd,
  * readable by any engine.
  */
object DelimitedText {

  /** S1/S2: read a headerless, `sep`-delimited text file into typed
    * columns. `schema` gives names and types positionally.
    */
  def readDelimited(spark: SparkSession, path: String, sep: String,
                    schema: StructType,
                    charset: String = "UTF-8"): DataFrame = {
    val quoted = java.util.regex.Pattern.quote(sep)
    val parts = split(col("value"), quoted)
    // `get` (0-based) yields null for short lines instead of an ANSI
    // out-of-bounds error — malformed rows surface as nulls, not crashes.
    val cols = schema.fields.zipWithIndex.map { case (StructField(n, t, _, _), i) =>
      get(parts, lit(i)).cast(t).as(n)
    }
    // Whole-line scan via the CSV source (the text source ignores the
    // encoding option): a sep/quote pair outside the data alphabet makes
    // each decoded line one `value` column; still splittable.
    spark.read
      .option("encoding", charset).option("lineSep", "\n")
      .option("sep", "\u0001").option("quote", "\u0000")
      .schema(StructType(Seq(StructField("value", StringType))))
      .csv(path)
      .select(cols.toSeq: _*)
  }

  /** S3: header CSV with explicit schema. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** S4: header CSV sink. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** S6: keyed parquet artifact sink — the engine's replacement for the
    * reference's pickle exchange. Partitioned by hash of the key via
    * `repartition` so downstream keyed reads co-locate.
    */
  def writeKeyedArtifact(df: DataFrame, keyCol: String, path: String,
                         partitions: Int = 0): Unit = {
    val out = if (partitions > 0) df.repartition(partitions, col(keyCol)) else df
    out.write.mode("overwrite").parquet(path)
  }

  /** S6: artifact source. */
  def readArtifact(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S5: parquet sink with literal ingestion timestamps (Feast-analogue;
    * ref: offline_to_online/rank/s1_feature_to_feast.py:11-17, which
    * stamps tz-aware literals in Asia/Shanghai). `tz` renders the stamp
    * in the reference's zone regardless of the session zone; the stored
    * instant is unchanged (parquet timestamps are UTC-normalized) — the
    * zone only affects the human-readable rendering column.
    */
  def writeSnapshotParquet(df: DataFrame, path: String,
                           tz: String = "Asia/Shanghai"): Unit =
    df.withColumn("event_timestamp", current_timestamp())
      .withColumn("created", current_timestamp())
      .withColumn("created_tz",
        concat(date_format(convert_timezone(lit(tz), current_timestamp()),
          "yyyy-MM-dd HH:mm:ss"), lit(" "), lit(tz)))
      .write.mode("overwrite").parquet(path)

  /** JSON-lines scan with an EXPLICIT schema (never inferred — schema
    * inference is a full extra pass over 100 TB and non-deterministic
    * under corrupt rows). PERMISSIVE mode routes malformed lines into
    * `_corrupt_record` when the caller includes it in the schema,
    * matching the malformed-as-null contract of [[readDelimited]].
    */
  def readJsonLines(spark: SparkSession, path: String,
                    schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  /** Hive-style partitioned parquet sink: one directory per
    * `partitionCol` value. At 100 TB this is what makes time/category
    * predicates prune whole directories at planning time instead of
    * scanning files (PartitionFilters in the scan node — asserted in
    * SourcesSpec).
    */
  def writePartitioned(df: DataFrame, partitionCol: String, path: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** ORC sink/source — the second columnar interchange format (some
    * lakehouses are ORC-native). Same pushdown/pruning behavior as
    * parquet under Spark's native reader.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Schema-evolution read: union the schemas of all parquet footers
    * under `path` (columns missing in older files surface as nulls).
    * `mergeSchema` is a per-footer metadata merge, not a data pass —
    * safe at 100 TB, unlike schema INFERENCE on text formats.
    */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Compacting sink — the small-file mitigation: coalesce to
    * ⌈rows / targetRowsPerFile⌉ files before writing. At 100 TB the
    * row count comes from table stats or the upstream job, not a
    * count() — the parameter keeps the policy explicit and testable.
    */
  def writeCompacted(df: DataFrame, rowCount: Long, targetRowsPerFile: Long,
                     path: String): Unit = {
    val files = math.max(1L, (rowCount + targetRowsPerFile - 1) / targetRowsPerFile)
    df.coalesce(files.toInt).write.mode("overwrite").parquet(path)
  }
}
