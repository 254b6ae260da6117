package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations over a frame — the validation layer a
  * 100 TB ingest runs before training data leaves a stage (null
  * ratios, range bounds, referential sanity).
  *
  * All expectations evaluate in ONE scan (a single aggregate of
  * violation-flag sums); the report is O(#expectations) rows, so the
  * check adds a pass over the data and nothing else — no shuffle, no
  * driver materialization beyond the tiny report.
  */
object QualityChecks {

  case class Expectation(name: String, violatedWhen: Column)

  /** Evaluate all expectations in one pass. Returns
    * (name, violations, pass) per expectation.
    */
  def report(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "no expectations given")
    val aggs = expectations.zipWithIndex.map { case (e, i) =>
      sum(e.violatedWhen.cast("long")).as(s"__v_$i")
    }
    val names = expectations.zipWithIndex
      .map { case (e, i) =>
        val quoted = e.name.replace("\\", "\\\\").replace("'", "\\'")
        s"'$quoted', coalesce(__v_$i, 0)"
      }
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${expectations.length}, ${names.mkString(", ")}) " +
        "AS (name, violations)")
      .withColumn("pass", (col("violations") === 0).cast("int"))
  }

  /** Fail fast: throw with the failing expectations if any violate. */
  def enforce(df: DataFrame, expectations: Seq[Expectation]): Unit = {
    val bad = report(df, expectations).filter(col("pass") === 0)
      .select("name", "violations").collect()
    require(bad.isEmpty,
      "quality expectations failed: " +
        bad.map(r => s"${r.getString(0)} (${r.getLong(1)} rows)").mkString(", "))
  }
}
