package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway measurement harness for optimization experiments (not a
  * driver surface; removed or kept dormant between rounds).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $label: ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    // warmup
    drain(graft.tables.Tables.lineitem(spark, dir).groupBy("l_returnflag").count())

    val df = graft.tables.Tables.lineitem(spark, dir)
    val (g, x, y) = ("l_returnflag", "l_quantity", "l_extendedprice")
    val joint = df.groupBy(col(g), col(x), col(y)).agg(count(lit(1)).as("__w"))
    val wg = Window.partitionBy(col(g))
    val wgx = Window.partitionBy(col(g)).orderBy(col(x))
    val wgy = Window.partitionBy(col(g)).orderBy(col(y))
    val tx = Window.partitionBy(col(g), col(x))
    val ty = Window.partitionBy(col(g), col(y))
    val j = joint
      .withColumn("__tot", sum("__w").over(wg))
      .withColumn("__rx",
        lit(2) * sum("__w").over(wgx) - sum("__w").over(tx) - col("__tot"))
      .withColumn("__ry",
        lit(2) * sum("__w").over(wgy) - sum("__w").over(ty) - col("__tot"))
    (1 to 2).foreach { i =>
      time(s"joint only (run $i)") { drain(joint) }
      time(s"joint+windows (run $i)") { drain(j) }
      time(s"windows+long-agg (run $i)") { drain(
        j.groupBy(col(g)).agg(sum(col("__w")).as("__n"),
          sum(expr("__w * __rx * __ry")).as("__sxy"),
          sum(expr("__w * __rx * __rx")).as("__sxx"),
          sum(expr("__w * __ry * __ry")).as("__syy"))) }
      time(s"full spearman decimal (run $i)") { drain(
        graft.operators.MetricOps.spearman(df, g, x, y)) }
    }
    spark.stop()
  }
}
