package graft

import graft.operators.{RelationalOps, RetrievalOps}
import org.apache.spark.sql.functions._

/** Pins the review-hardened edge-case semantics: fingerprint boundary/
  * null safety, null-seen and duplicate-term retrieval behavior,
  * zero-norm exclusion, duplicate-catalog sampling.
  */
class HardeningSpec extends SparkSpec {

  import spark.implicits._

  test("snapshotDiff: column-boundary shifts and null/value swaps are changes") {
    val nul: String = null
    val old1 = Seq((1L, "ab", "c"), (2L, nul, "x"), (3L, "s", "t"))
      .toDF("k", "v1", "v2")
    val new1 = Seq((1L, "a", "bc"), (2L, "x", nul), (3L, "s", "t"))
      .toDF("k", "v1", "v2")
    val out = RelationalOps.snapshotDiff(old1, new1, "k", Seq("v1", "v2"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "changed", 2L -> "changed"),
      s"boundary shift and null swap must both register: $out")
  }

  test("termRecall: null seen array means unfiltered; duplicate terms score as sets") {
    val users = Seq(
      (1L, Seq("g1", "g1", "g2"), null.asInstanceOf[Seq[String]]),
      (2L, Seq("g1"), Seq("itemA"))).toDF("u", "terms", "seen")
    val items = Seq(("itemA", Seq("g1", "g1")), ("itemB", Seq("g2")))
      .toDF("item", "terms")
    val out = RetrievalOps.termRecall(users, items, "u", "terms", "seen",
        "item", "terms", 1.0, 10)
      .as[(Long, String, Double)].collect().toSet
    // user 1 (null seen): sees both items; scores are SET overlaps (1.0
    // each, never 2.0 from the duplicated g1). user 2: itemA seen-filtered.
    assert(out == Set((1L, "itemA", 1.0), (1L, "itemB", 1.0)), s"got $out")
  }

  test("knnRecall: zero-norm vectors are excluded, not divide-by-zero") {
    val users = Seq(
      (1L, Seq(1.0f, 0.0f), Seq.empty[String]),
      (2L, Seq(0.0f, 0.0f), Seq.empty[String])).toDF("u", "vector", "seen")
    val items = Seq(("a", Seq(1.0f, 0.0f)), ("z", Seq(0.0f, 0.0f)))
      .toDF("item", "vector")
    val out = RetrievalOps.knnRecall(users, items, "u", "vector", "seen",
        "item", "vector", 1.0, 10)
      .as[(Long, String, Double)].collect()
    assert(out.map(r => (r._1, r._2)).toSet == Set((1L, "a")),
      s"only the nonzero user×item pair survives: ${out.toSeq}")
  }

  test("negativeSample: duplicate catalog rows neither duplicate nor burn slots") {
    val seen = Seq((1L, 10L)).toDF("u", "item")
    val items = Seq(10L, 11L, 11L, 12L, 13L).toDF("item")
    val out = RetrievalOps.negativeSample(seen, items, "u", "item", 3)
      .as[(Long, Long)].collect()
    assert(out.length == 3 && out.map(_._2).distinct.length == 3 &&
      !out.map(_._2).contains(10L),
      s"3 distinct unseen negatives expected: ${out.toSeq}")
  }
}
