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

  test("rankingMetrics: perfect list → ndcg/mrr/recall = 1; degraded list < 1") {
    // user 1: both positives ranked on top (perfect for k=3, npos=2)
    // user 2: single positive at rank 3 → mrr = 1/3, ndcg = w3/w1
    // user 3: no positives → excluded
    val df = Seq(
      (1L, 10L, 0.9, 1), (1L, 11L, 0.8, 1), (1L, 12L, 0.7, 0),
      (2L, 20L, 0.9, 0), (2L, 21L, 0.8, 0), (2L, 22L, 0.7, 1),
      (3L, 30L, 0.9, 0)).toDF("u", "i", "score", "label")
    val out = MetricOps.rankingMetrics(df, "u", "i", "score", "label", 3)
      .as[(Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((1L, 1.0, 1.0, 1.0)))
    val w1 = 1.0 / (math.log(2.0) / math.log(2.0))   // = 1
    val w3 = 1.0 / (math.log(4.0) / math.log(2.0))   // = 0.5
    assert(math.abs(out(2L)._2 - w3 / w1) < 1e-6)
    assert(math.abs(out(2L)._3 - 1.0 / 3.0) < 1e-6)
    assert(out(2L)._4 == 1.0)
  }

  test("rankingMetrics: positive beyond k hurts recall but not excluded users") {
    val df = Seq(
      (1L, 10L, 0.9, 1), (1L, 11L, 0.8, 0), (1L, 12L, 0.7, 1))
      .toDF("u", "i", "score", "label")
    val out = MetricOps.rankingMetrics(df, "u", "i", "score", "label", 2)
      .as[(Long, Double, Double, Double)].collect().head
    assert(out._4 == 0.5)           // 1 of 2 positives inside k=2
    assert(out._3 == 1.0)           // first positive at rank 1
    assert(out._2 > 0.5 && out._2 < 1.0)
  }

  test("calibration: bins partition scores; pos_rate tracks a calibrated model") {
    val rows = for (i <- 0 until 1000) yield {
      val score = (i % 100) / 100.0
      (score, if ((i * 7919) % 100 < (score * 100).toInt) 1 else 0)
    }
    val out = MetricOps.calibration(rows.toDF("score", "label"), "score", "label", 10)
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    assert(out.map(_._2).sum == 1000L)
    assert(out.map(_._1).toSeq == (0 until 10))
    // monotone-ish: top bin must out-rate bottom bin by a wide margin
    assert(out.last._4 > out.head._4 + 0.5)
    out.foreach { case (bin, _, mean, _) =>
      assert(mean >= bin / 10.0 - 1e-9 && mean < (bin + 1) / 10.0 + 1e-9)
    }
  }

  test("psi: identical slices ≈ 0, shifted slices large") {
    val same = (0 until 400).map(i => (i % 100 * 2.0, if (i % 2 == 0) "e" else "a"))
    val psiSame = MetricOps.psi(same.toDF("v", "side"), "v", "side", "e", 50.0, 10)
      .select("psi_total").as[Double].head()
    assert(psiSame < 0.01, s"identical slices drifted: $psiSame")
    val shifted = (0 until 400).map(i =>
      if (i % 2 == 0) (i % 100 * 1.0, "e") else (100.0 + i % 100 * 2.0, "a"))
    val psiShift = MetricOps.psi(shifted.toDF("v", "side"), "v", "side", "e", 50.0, 10)
      .select("psi_total").as[Double].head()
    assert(psiShift > 0.25, s"shifted slices not flagged: $psiShift")
  }

  test("approxConstPruneReport still detects constant columns") {
    val df = Seq((1, 7), (2, 7), (3, 7)).toDF("a", "const")
    val rep = MetricOps.approxConstPruneReport(df, Seq("a", "const"))
      .orderBy("col_name").select("col_name", "keep").as[(String, Int)].collect()
    assert(rep.toSeq == Seq(("a", 1), ("const", 0)))
  }
}
