package graft

import graft.sources.BucketedTables
import graft.tables.Tables
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Storage-level co-location contract: joins and aggregations on the
  * bucket key of a bucketed table run with ZERO exchanges, and point
  * lookups prune to a single bucket. This is the 100 TB recurring-join
  * answer (SURVEY §4): pay one shuffle at write time, then every
  * downstream join on that key is exchange-free.
  */
class BucketedJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val dir = "/root/testdata/sf0.001"
  private val warehouse = "/tmp/graft_bucketed"

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.count()
    collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: ShuffleExchangeLike => s
    }.length
  }

  private lazy val setup: Unit = {
    BucketedTables.writeBucketed(
      Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity",
        "l_extendedprice"),
      "b_lineitem", "l_orderkey", 8, s"$warehouse/lineitem")
    BucketedTables.writeBucketed(
      Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority",
        "o_totalprice"),
      "b_orders", "o_orderkey", 8, s"$warehouse/orders")
  }

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("fact-fact join on the bucket key plans zero exchanges") {
    setup
    withNoBroadcast {
      val joined = BucketedTables.read(spark, "b_lineitem")
        .join(BucketedTables.read(spark, "b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      assert(shuffles(joined) == 0,
        "bucketed sides must satisfy the join distribution from the scan")
      // and it is the same join: row count matches the plain-parquet join
      val plain = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir),
          col("l_orderkey") === col("o_orderkey"))
      assert(joined.count() == plain.count())
    }
  }

  test("aggregation on the bucket key plans zero exchanges") {
    setup
    val agg = BucketedTables.read(spark, "b_lineitem")
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
    assert(shuffles(agg) == 0,
      "bucketed scan partitioning must satisfy the aggregation distribution")
  }

  test("point lookup on the bucket key prunes to one bucket") {
    setup
    // the planner's auto-bucketed-scan turns bucketing off when no
    // join/agg wants the partitioning — pin it on so the filter can
    // prune buckets (what a serving-snapshot point read would set)
    val conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(conf, "true")
    spark.conf.set(conf, "false")
    try {
      val key = BucketedTables.read(spark, "b_lineitem")
        .select("l_orderkey").head().getLong(0)
      val one = BucketedTables.read(spark, "b_lineitem")
        .filter(col("l_orderkey") === key)
      val s = one.queryExecution.executedPlan.toString
      assert(s.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected single-bucket pruning, plan:\n${s.take(2000)}")
    } finally spark.conf.set(conf, prev)
  }

  override def afterAll(): Unit = {
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    super.afterAll()
  }
}
