package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.MetricOps

/** Distributed rank/AUC equals the single-window form; salted
  * aggregation equals direct aggregation.
  */
class MetricOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val scored = {
    val r = new scala.util.Random(7)
    (0 until 500).map(i => (i.toLong, r.nextInt(20).toLong, r.nextInt(2)))
      .toDF("id", "score", "label")
  }

  test("globalRank equals the single-partition row_number rank") {
    val dist = MetricOps.globalRank(scored, "score", "id")
      .select("id", "r").as[(Long, Long)].collect().toMap
    val single = scored.withColumn("r",
        row_number().over(Window.orderBy(col("score"), col("id"))).cast("long"))
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(dist == single)
  }

  test("distributed AUC equals the window-rank AUC formula") {
    val a = MetricOps.auc(scored, "label", "score", "id")
      .as[Double].head()
    val ranked = scored.withColumn("r",
      row_number().over(Window.orderBy(col("score"), col("id"))).cast("long"))
    val b = ranked.agg(
      round(
        (sum(when(col("label") === 1, col("r")).otherwise(0L)).cast("double")
          - sum(col("label")).cast("double") * (sum(col("label")) + 1) / 2)
          / (sum(col("label")).cast("double")
            * (count(lit(1)) - sum(col("label")))), 6)).as[Double].head()
    assert(a == b)
    assert(a > 0.3 && a < 0.7)   // random labels ≈ chance
  }

  test("globalRank keeps null scores and ranks them last (ANSI/DuckDB order)") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(1L)), (4L, None))
      .toDF("id", "score")
    val ranks = MetricOps.globalRank(df, "score", "id")
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(ranks.size == 4, "null-score rows must not be dropped")
    assert(ranks == Map(3L -> 1L, 1L -> 2L, 2L -> 3L, 4L -> 4L))
  }

  test("saltedCountSum equals direct groupBy count/sum") {
    val skewed = (0 until 1000).map(i => (if (i < 900) 1L else i.toLong, i.toDouble))
      .toDF("k", "v")
    val salted = MetricOps.saltedCountSum(skewed, "k", "v", 8)
      .orderBy("k").as[(Long, Long, Double)].collect().toSeq
    val direct = skewed.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sum"))
      .orderBy("k").as[(Long, Long, Double)].collect().toSeq
    assert(salted.map(r => (r._1, r._2)) == direct.map(r => (r._1, r._2)))
    // double sums: same addends, possibly different order — compare loosely
    salted.zip(direct).foreach { case (s, dr) =>
      assert(math.abs(s._3 - dr._3) < 1e-6)
    }
  }

  test("approxConstPruneReport still detects constant columns") {
    val df = Seq((1, 7), (2, 7), (3, 7)).toDF("a", "const")
    val rep = MetricOps.approxConstPruneReport(df, Seq("a", "const"))
      .orderBy("col_name").select("col_name", "keep").as[(String, Int)].collect()
    assert(rep.toSeq == Seq(("a", 1), ("const", 0)))
  }
}
