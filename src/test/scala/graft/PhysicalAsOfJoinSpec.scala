package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.plans.GraftExtensions

/** The native sort-merge AsOfJoinExec: semantics on literal frames,
  * agreement with the window-form twin, the SQL surface, and the
  * physical plan actually containing the custom node.
  */
class PhysicalAsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // (k, q_ts) unique: ties among equal (key, ts) right rows resolve by
  // physical order, which is not part of the operator's contract.
  private lazy val quotes = Seq(
    (1L, 10L, 1.0), (1L, 19L, 2.0), (1L, 20L, 2.5),
    (2L, 5L, 9.0)).toDF("k", "q_ts", "px")
  private lazy val trades = Seq(
    (1L, 9L), (1L, 10L), (1L, 25L), (2L, 4L), (3L, 100L))
    .toDF("k", "t_ts")

  test("inner as-of: latest quote at-or-before each trade; no-match drops") {
    val out = AsOfJoin.exec(trades, quotes, Seq("k"), "t_ts", "q_ts")
      .select(trades("k"), col("t_ts"), col("q_ts"), col("px"))
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    // trade (1,9) has no quote ≤ 9 → dropped; (1,10) matches inclusively;
    // (1,25) takes the newest quote (ts=20); trade (2,4) precedes
    // the only k=2 quote → dropped; k=3 has no quotes at all.
    assert(out.toSeq == Seq((1L, 10L, 10L, 1.0), (1L, 25L, 20L, 2.5)))
  }

  test("left-outer as-of null-extends unmatched trades") {
    val out = AsOfJoin.exec(trades, quotes, Seq("k"), "t_ts", "q_ts", "left")
      .select(trades("k"), col("t_ts"), col("px"))
      .as[(Long, Long, Option[Double])].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (1L, 9L, None), (1L, 10L, Some(1.0)), (1L, 25L, Some(2.5)),
      (2L, 4L, None), (3L, 100L, None)))
  }

  test("physical plan contains AsOfJoinExec with shuffled sorted children") {
    val df = AsOfJoin.exec(trades, quotes, Seq("k"), "t_ts", "q_ts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    assert(plan.contains("Sort") && plan.contains("Exchange"))
  }

  test("SQL surface: graft_asof in a join condition plans to the exec") {
    GraftExtensions.register(spark)
    trades.createOrReplaceTempView("trades_v")
    quotes.createOrReplaceTempView("quotes_v")
    val df = spark.sql(
      """SELECT t.k, t.t_ts, q.px FROM trades_v t JOIN quotes_v q
        |ON t.k = q.k AND graft_asof(t.t_ts, q.q_ts)""".stripMargin)
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val out = df.as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq((1L, 10L, 1.0), (1L, 25L, 2.5)))
  }

  test("null keys and null timestamps never match") {
    val l = Seq((Some(1L), Some(10L)), (None, Some(10L)), (Some(1L), None))
      .toDF("k", "t_ts")
    val r = Seq((Some(1L), Some(5L), 7.0), (None, Some(1L), 8.0),
      (Some(1L), None, 9.0)).toDF("k", "q_ts", "px")
    val inner = AsOfJoin.exec(l, r, Seq("k"), "t_ts", "q_ts")
      .select(l("k"), col("t_ts"), col("px"))
      .as[(Option[Long], Option[Long], Double)].collect()
    assert(inner.toSeq == Seq((Some(1L), Some(10L), 7.0)))
    val outer = AsOfJoin.exec(l, r, Seq("k"), "t_ts", "q_ts", "left")
    assert(outer.count() == 3)
  }

  test("composite keys: both columns must match, as-of still applies") {
    val l = Seq((1L, "x", 10L, 100L), (1L, "y", 10L, 101L), (2L, "x", 10L, 102L))
      .toDF("k1", "k2", "t_ts", "lid")
    val r = Seq((1L, "x", 5L, 1.0), (1L, "y", 7L, 2.0), (2L, "z", 3L, 3.0))
      .toDF("k1", "k2", "q_ts", "px")
    val out = AsOfJoin.exec(l, r, Seq("k1", "k2"), "t_ts", "q_ts", "left")
      .select(col("lid"), col("px"))
      .as[(Long, Option[Double])].collect().toMap
    assert(out == Map(100L -> Some(1.0), 101L -> Some(2.0), 102L -> None))
  }

  test("exec survives aggressive AQE coalescing + skew, still ≡ window form") {
    val overrides = Map(
      "spark.sql.shuffle.partitions" -> "64",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1B")
    val prev = overrides.keys.map(k => k -> spark.conf.getOption(k)).toMap
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // skew: key 0 holds ~90% of left rows; AQE will want to coalesce
      // the tiny partitions and split the fat one — the exec's children
      // must stay co-partitioned through all of it.
      val left = spark.range(50000).select(
        when(col("id") % 10 === 0, col("id") % 7).otherwise(lit(0L)).as("k"),
        (col("id") % 1000).as("lts"), col("id").as("lid"))
      val right = spark.range(3000).select(
        (col("id") % 7).as("k"), (col("id") % 997).as("rts"),
        (col("id") % 100).cast("double").as("px"))
        .dropDuplicates("k", "rts")
      val ex = AsOfJoin.exec(left, right, Seq("k"), "lts", "rts", "left")
        .agg(count(lit(1)).as("n"), sum("px").as("s"), sum("lid").as("l"))
        .as[(Long, Double, Long)].collect().head
      val win = AsOfJoin(left, right, "k", "lts", "rts", Seq("px"), "rts")
        .agg(count(lit(1)).as("n"), sum("px").as("s"), sum("lid").as("l"))
        .as[(Long, Double, Long)].collect().head
      assert(ex._1 == 50000L && ex._1 == win._1 && ex._3 == win._3)
      assert(math.abs(ex._2 - win._2) < 1e-6)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("exec agrees with the window-form AsOfJoin on events-shaped data") {
    val n = 2000
    val left = spark.range(n).select(
      (col("id") % 37).as("k"), (col("id") * 7 % 1000).as("t_ts"),
      col("id").as("lid"))
    val right = spark.range(500).select(
      (col("id") % 37).as("k"), (col("id") * 13 % 1000).as("q_ts"),
      (col("id") % 100).cast("double").as("px"), col("id").as("rid"))
      .dropDuplicates("k", "q_ts")
    val execOut = AsOfJoin.exec(left, right, Seq("k"), "t_ts", "q_ts", "left")
      .select(left("lid"), col("px"))
      .as[(Long, Option[Double])].collect().toMap
    val windowOut = AsOfJoin(left, right.drop("rid"), "k", "t_ts", "q_ts",
        Seq("px"), "q_ts")
      .select(col("lid"), col("px"))
      .as[(Long, Option[Double])].collect().toMap
    assert(execOut.size.toLong == n && execOut == windowOut)
  }
}
