package graft

import org.apache.spark.sql.functions._
import graft.operators.{RetrievalOps, ServingOps, SimilarityOps}

/** Serving snapshot round-trip + the reference's own validation checks
  * (SURVEY §5.1): Redis round-trip, ES term-index parity, vector
  * self-retrieval.
  */
class ServingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val terms = Seq((1L, Seq("action", "comedy"))).toDF("user_id", "terms")
  private lazy val seen = Seq((1L, Seq(10L, 11L)), (2L, Seq(12L))).toDF("user_id", "seen")
  private lazy val vectors = Seq((1L, Seq(0.5f, -0.25f))).toDF("user_id", "vector")

  test("snapshot round-trip: build → lookup reproduces state; misses get defaults") {
    val snap = ServingOps.buildSnapshot(terms, seen, vectors, "user_id")
    val reqs = Seq(1L, 2L, 99L).toDF("user_id")
    val out = ServingOps.pointLookup(reqs, snap, "user_id", 2)
      .orderBy("user_id")
      .as[(Long, Seq[String], Seq[Float], Seq[Long])].collect()

    assert(out(0) == ((1L, Seq("action", "comedy"), Seq(0.5f, -0.25f), Seq(10L, 11L))))
    // user 2: only a seen list — terms default [], vector default [1,1]
    assert(out(1) == ((2L, Seq(), Seq(1.0f, 1.0f), Seq(12L))))
    // user 99: full miss — all defaults (the redis_caller.py:19-35 contract)
    assert(out(2) == ((99L, Seq(), Seq(1.0f, 1.0f), Seq())))
  }

  test("ES term-index parity check (s2_item_to_es.py:65-80 analogue)") {
    val items = Seq(
      (10L, Seq("action")), (11L, Seq("action", "comedy")), (12L, Seq("drama")))
      .toDF("item_id", "terms")
    // "index-side" count via explode (the inverted-index scan) must equal
    // the direct predicate count for every term
    val indexed = items.select(explode($"terms").as("t"))
      .groupBy("t").count().as[(String, Long)].collect().toMap
    for (t <- Seq("action", "comedy", "drama")) {
      val direct = items.filter(array_contains($"terms", t)).count()
      assert(indexed(t) == direct, s"term $t")
    }
  }

  test("vector self-retrieval: an item's own vector retrieves that item first") {
    val items = Seq(
      (10L, Seq(1.0f, 0.0f, 0.5f)), (11L, Seq(-1.0f, 0.3f, 0.0f)),
      (12L, Seq(0.2f, 0.9f, -0.4f)))
      .toDF("item_id", "vector")
    // probe with item 11's own vector, no seen filter
    val probe = Seq((99L, Seq.empty[Long], Seq(-1.0f, 0.3f, 0.0f)))
      .toDF("user_id", "seen", "vector")
    val top = RetrievalOps.knnRecall(probe, items, "user_id", "vector", "seen",
        "item_id", "vector", 1.0, 1)
      .select("item_id").as[Long].head()
    assert(top == 11L)
  }

  test("fillWithReport counts the nulls it fills, per column") {
    val df = Seq(
      (Some(1.0), Some(2.0)), (None, Some(3.0)), (None, None))
      .toDF("a", "b")
    val (filled, report) = ServingOps.fillWithReport(df, Seq("b", "a"), 0.0)
    assert(filled.filter($"a".isNull || $"b".isNull).count() == 0)
    assert(report.orderBy("col_name").as[(String, Long)].collect().toSeq ==
      Seq(("a", 2L), ("b", 1L)))
  }
}
