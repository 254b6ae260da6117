package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.RelationalOps
import graft.sources.DelimitedText

/** Published-count parity on the REAL ml-1m dataset (SURVEY §5.2.4):
  * the reference's readme.md:35-37 records 575,281 positive / 424,928
  * negative labels and a 754,233 / 185,576 / 60,400 train/test/holdout
  * split. The container ships the reference without its large blobs
  * (ratings.dat is listed in .MISSING_LARGE_BLOBS), so this spec guards
  * on the file's presence and cancels cleanly when absent — the
  * assertions fire the moment real data appears at the reference path.
  *
  * The golden counts are tiebreak-insensitive: label totals depend only
  * on ratings, and split totals only on per-user row counts, so pandas'
  * stable-sort file-order ties vs our explicit itemid tiebreak cannot
  * change them.
  */
class MovieLensGoldenSpec extends SparkSpec {
  import spark.implicits._

  private val ratingsPath =
    "/root/reference/data_exchange_center/offline/ml-1m/ratings.dat"

  private val ratingsSchema = StructType(Seq(
    StructField("userid", LongType), StructField("itemid", LongType),
    StructField("rating", IntegerType), StructField("ts", LongType)))

  test("ml-1m golden counts: 575281/424928 labels, 754233/185576/60400 split") {
    val p = Paths.get(ratingsPath)
    assume(Files.exists(p) && Files.size(p) > 0,
      s"ml-1m ratings.dat absent ($ratingsPath is a missing large blob)")

    val ratings = DelimitedText.readDelimited(spark, ratingsPath, "::", ratingsSchema)
    val labeled = RelationalOps.labelEncode(ratings, "rating", 3)

    val labelCounts = labeled.groupBy("label").count()
      .as[(Int, Long)].collect().toMap
    assert(labelCounts == Map(1 -> 575281L, 0 -> 424928L),
      s"label counts diverge from readme.md:35: $labelCounts")

    val rn = RelationalOps.rowNumber(labeled, "userid",
        Seq(col("ts"), col("itemid")))
      .withColumn("u_cnt", count(lit(1)).over(Window.partitionBy("userid")))
    val splitCounts = RelationalOps.threeWaySplit(rn, "rn", "u_cnt", 10, 0.2)
      .groupBy("istest").count().as[(Int, Long)].collect().toMap
    assert(splitCounts == Map(0 -> 754233L, 1 -> 185576L, 2 -> 60400L),
      s"split counts diverge from readme.md:36-37: $splitCounts")
  }
}
