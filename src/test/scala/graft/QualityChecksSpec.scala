package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityChecks
import graft.operators.QualityChecks.Expectation

class QualityChecksSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some(10.0), "click"), (2L, None, "view"), (3L, Some(-5.0), "zzz"))
    .toDF("id", "value", "event_type")

  test("report evaluates all expectations in one pass with per-check counts") {
    val rep = QualityChecks.report(df, Seq(
      Expectation("value_not_null", $"value".isNull),
      Expectation("value_non_negative", $"value" < 0),
      Expectation("known_event_type",
        !$"event_type".isin("click", "view", "purchase", "signup", "error")),
      Expectation("id_positive", $"id" <= 0)))
      .orderBy("name").as[(String, Long, Int)].collect()
    assert(rep.toSeq == Seq(
      ("id_positive", 0L, 1), ("known_event_type", 1L, 0),
      ("value_non_negative", 1L, 0), ("value_not_null", 1L, 0)))
  }

  test("enforce throws naming the failing expectations") {
    val e = intercept[IllegalArgumentException] {
      QualityChecks.enforce(df, Seq(Expectation("value_not_null", $"value".isNull)))
    }
    assert(e.getMessage.contains("value_not_null") && e.getMessage.contains("1 rows"))
    QualityChecks.enforce(df, Seq(Expectation("id_positive", $"id" <= 0)))  // passes
  }
}
