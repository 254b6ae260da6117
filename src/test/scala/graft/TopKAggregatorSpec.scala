package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.functions.TopKAggregator
import graft.operators.RelationalOps

/** Bounded top-k aggregation must equal the window row_number form,
  * tiebreaks included.
  */
class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("aggregator top-k equals window top-k on random data with ties") {
    val r = new Random(11)
    val df = (0 until 5000)
      .map(i => (r.nextInt(20).toLong, i.toLong, (r.nextInt(50) / 10.0)))
      .toDF("g", "id", "score")

    val win = RelationalOps.topKPerGroup(df, "g",
        Seq(col("score").desc, col("id")), 3)
      .select("g", "id", "score").as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap

    val agg = df.groupBy("g")
      .agg(TopKAggregator.topK(3, col("score"), col("id")).as("top"))
      .select(col("g"), explode(col("top")).as("t"))
      .select(col("g"), col("t.id"), col("t.score"))
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap

    assert(agg == win)
  }

  test("NaN scores order first (like DESC sort in Spark/DuckDB) and never corrupt the buffer") {
    val df = Seq((1L, 10L, 5.0), (1L, 11L, Double.NaN), (1L, 12L, 4.0), (1L, 13L, 3.0))
      .toDF("g", "id", "score")
    val top = df.groupBy("g")
      .agg(TopKAggregator.topK(3, col("score"), col("id")).as("top"))
      .select("top").as[Seq[(Long, Double)]].head()
    assert(top.map(_._1) == Seq(11L, 10L, 12L))   // NaN > 5.0 > 4.0; 3.0 evicted
  }

  test("aggregator preserves best-first order within each group") {
    val df = Seq((1L, 10L, 1.0), (1L, 11L, 3.0), (1L, 12L, 3.0), (1L, 13L, 2.0))
      .toDF("g", "id", "score")
    val top = df.groupBy("g")
      .agg(TopKAggregator.topK(3, col("score"), col("id")).as("top"))
      .select("top").as[Seq[(Long, Double)]].head()
    assert(top == Seq((11L, 3.0), (12L, 3.0), (13L, 2.0)))
  }
}
