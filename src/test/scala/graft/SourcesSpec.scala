package graft

import java.nio.charset.Charset
import java.nio.file.Files

import org.apache.spark.sql.types._
import graft.sources.DelimitedText

/** S1/S2/S3/S6 — delimited text scan (multi-char `::`, charset),
  * CSV round-trip, keyed parquet artifacts.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir() = Files.createTempDirectory(
    java.nio.file.Paths.get("target"), "src-spec").toString

  test("S1: '::'-delimited headerless scan with declared schema") {
    val dir = tmpDir()
    val f = s"$dir/ratings.dat"
    Files.writeString(java.nio.file.Paths.get(f),
      "1::1193::5::978300760\n1::661::3::978302109\n2::1357::5::978298709\n")
    val schema = StructType(Seq(
      StructField("userid", LongType), StructField("itemid", LongType),
      StructField("rating", IntegerType), StructField("ts", LongType)))
    val df = DelimitedText.readDelimited(spark, f, "::", schema)
    assert(df.schema.fieldNames.toSeq == Seq("userid", "itemid", "rating", "ts"))
    val rows = df.orderBy("userid", "itemid").as[(Long, Long, Int, Long)].collect()
    assert(rows.head == ((1L, 661L, 3, 978302109L)))
    assert(rows.length == 3)
  }

  test("S1: malformed short lines produce nulls, not errors") {
    val dir = tmpDir()
    val f = s"$dir/bad.dat"
    Files.writeString(java.nio.file.Paths.get(f), "1::2\n3::4::5::6\n")
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", LongType),
      StructField("c", LongType), StructField("d", LongType)))
    val df = DelimitedText.readDelimited(spark, f, "::", schema)
    assert(df.filter($"c".isNull).count() == 1)
  }

  test("S2: ISO-8859-1 charset scan preserves Latin-1 titles") {
    val dir = tmpDir()
    val f = s"$dir/movies.dat"
    Files.write(java.nio.file.Paths.get(f),
      "7::Café Molière::Comedy\n".getBytes(Charset.forName("ISO-8859-1")))
    val schema = StructType(Seq(
      StructField("itemid", LongType), StructField("title", StringType),
      StructField("genres", StringType)))
    val df = DelimitedText.readDelimited(spark, f, "::", schema, "ISO-8859-1")
    assert(df.select("title").as[String].head() == "Café Molière")
  }

  test("S3/S4: CSV sink + scan round-trip with explicit schema") {
    val dir = tmpDir() + "/csv"
    val in = Seq((1L, "a", 1.5), (2L, "b", -0.5)).toDF("id", "s", "v")
    DelimitedText.writeCsv(in, dir)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("s", StringType), StructField("v", DoubleType)))
    val back = DelimitedText.readCsv(spark, dir, schema)
    assert(back.orderBy("id").collect().toSeq == in.orderBy("id").collect().toSeq)
  }

  test("S5: snapshot parquet sink stamps ingestion timestamps (F6)") {
    val dir = tmpDir() + "/snap"
    DelimitedText.writeSnapshotParquet(Seq((1L, 2.0)).toDF("id", "v"), dir)
    val back = DelimitedText.readArtifact(spark, dir)
    assert(back.columns.toSet ==
      Set("id", "v", "event_timestamp", "created", "created_tz"))
    assert(back.filter($"event_timestamp".isNull).count() == 0)
    // the rendered stamp carries the reference's zone (Asia/Shanghai)
    assert(back.select("created_tz").as[String].head().endsWith("Asia/Shanghai"))
  }

  test("S6: keyed parquet artifact with array column round-trips") {
    val dir = tmpDir() + "/kv"
    val in = Seq((1L, Seq(1L, 2L, 3L)), (2L, Seq.empty[Long]))
      .toDF("user_id", "filter_items")
    DelimitedText.writeKeyedArtifact(in, "user_id", dir, partitions = 2)
    val back = DelimitedText.readArtifact(spark, dir)
    assert(back.count() == 2)
    assert(back.orderBy("user_id").as[(Long, Seq[Long])].collect()
      .toSeq == Seq((1L, Seq(1L, 2L, 3L)), (2L, Seq.empty[Long])))
  }

  test("JSON-lines scan with explicit schema; malformed rows don't crash") {
    import org.apache.spark.sql.types._
    val dir = tmpDir()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/r.jsonl"),
      """{"userid": 7, "score": 0.5}
        |not json at all
        |{"userid": 9}
        |""".stripMargin)
    val schema = StructType(Seq(StructField("userid", LongType),
      StructField("score", DoubleType)))
    val rows = DelimitedText.readJsonLines(spark, s"$dir/r.jsonl", schema)
      .orderBy("userid").collect()
    assert(rows.length == 3)
    assert(rows.map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSeq
      == Seq(-1L, 7L, 9L))
  }

  test("partitioned parquet sink: partition predicate prunes at planning time") {
    val dir = tmpDir() + "/part"
    val in = (1 to 100).map(i => (i.toLong, if (i % 2 == 0) "click" else "view"))
      .toDF("id", "event_type")
    DelimitedText.writePartitioned(in, "event_type", dir)
    val pruned = spark.read.parquet(dir).filter($"event_type" === "click")
    val qe = pruned.queryExecution
    // execute THIS plan instance so its scan metrics populate (count()
    // would build and run a separate aggregate plan)
    assert(qe.executedPlan.execute().count() == 50)
    val planStr = qe.executedPlan.toString
    assert(planStr.contains("PartitionFilters") &&
      planStr.contains("isnotnull(event_type"),
      "partition predicate must appear as a PartitionFilter on the scan")
    // directory-level pruning: the scan reads only the click partition's
    // files (inputFiles lists the whole relation, so count via metrics)
    val scan = qe.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val clickFiles = new java.io.File(s"$dir/event_type=click")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(scan.metrics("numFiles").value == clickFiles,
      s"scan read ${scan.metrics("numFiles").value} files, " +
        s"click partition has $clickFiles")
  }

  test("ORC sink + scan round-trip preserves schema and values") {
    val dir = tmpDir()
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")
    DelimitedText.writeOrc(df, s"$dir/orc")
    val back = DelimitedText.readOrc(spark, s"$dir/orc")
    // file reads are nullable-washed; names and types must survive
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("schema evolution: mergeSchema unions footers, old files null-extend") {
    val dir = tmpDir()
    Seq((1L, "x")).toDF("id", "a").write.parquet(s"$dir/ev/p=1")
    Seq((2L, "y", 9L)).toDF("id", "a", "b").write.parquet(s"$dir/ev/p=2")
    val merged = DelimitedText.readEvolved(spark, s"$dir/ev")
    assert(merged.columns.toSet == Set("id", "a", "b", "p"))
    val rows = merged.orderBy("id").select("id", "b")
      .as[(Long, Option[Long])].collect().toSeq
    assert(rows == Seq((1L, None), (2L, Some(9L))))
  }

  test("compacting sink bounds output file count by target rows per file") {
    val dir = tmpDir()
    val df = spark.range(1000).repartition(32)   // the small-file shape
    DelimitedText.writeCompacted(df.toDF(), 1000L, 400L, s"$dir/compact")
    val files = new java.io.File(s"$dir/compact").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files == 3, s"expected ceil(1000/400)=3 files, got $files")
    assert(DelimitedText.readArtifact(spark, s"$dir/compact").count() == 1000L)
  }
}
