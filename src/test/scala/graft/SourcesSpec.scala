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
    assert(back.columns.toSet == Set("id", "v", "event_timestamp", "created"))
    assert(back.filter($"event_timestamp".isNull).count() == 0)
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
}
