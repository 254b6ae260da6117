package graft

import graft.operators.RetrievalOps

/** R1/R2/R3 — term recall, kNN recall, hybrid union with seen-item
  * anti-filter (the es_caller.py semantics, relationally).
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val users = Seq(
    (1L, Seq("action", "comedy"), Seq(10L), Seq(1.0f, 0.0f)),
    (2L, Seq("drama"), Seq.empty[Long], Seq(0.0f, 1.0f)))
    .toDF("user_id", "terms", "seen", "vector")

  private val items = Seq(
    (10L, Seq("action"), Seq(1.0f, 0.1f)),
    (11L, Seq("action", "comedy"), Seq(0.9f, 0.2f)),
    (12L, Seq("drama"), Seq(0.1f, 1.0f)),
    (13L, Seq("romance"), Seq(0.5f, 0.5f)))
    .toDF("item_id", "terms", "vector")

  test("R1: term recall matches overlapping terms, excludes seen items") {
    val out = RetrievalOps.termRecall(users, items, "user_id", "terms", "seen",
      "item_id", "terms", 0.1, 10)
      .as[(Long, Long, Double)].collect().toSet
    // user 1: item 11 overlaps on 2 terms (score 0.2); item 10 is seen → excluded
    assert(out.contains((1L, 11L, 0.2)))
    assert(!out.exists(r => r._1 == 1L && r._2 == 10L))
    assert(out.contains((2L, 12L, 0.1)))
  }

  test("R2: kNN recall ranks by cosine and honors the anti-filter") {
    val out = RetrievalOps.knnRecall(users, items, "user_id", "vector", "seen",
      "item_id", "vector", 0.9, 2)
      .as[(Long, Long, Double)].collect()
    val u1 = out.filter(_._1 == 1L).map(_._2)
    assert(!u1.contains(10L))       // seen
    assert(u1.head == 11L)          // closest unseen to (1,0)
  }

  test("negativeSample: never a seen item, exactly n per user, re-run stable") {
    val seen = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("u", "i")
    val cat = (10L until 30L).toDF("i")
    val out = RetrievalOps.negativeSample(seen, cat, "u", "i", 4)
      .as[(Long, Long)].collect()
    val byUser = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byUser.keySet == Set(1L, 2L))
    assert(byUser.values.forall(_.size == 4))
    assert(!byUser(1L).contains(10L) && !byUser(1L).contains(11L))
    assert(!byUser(2L).contains(10L))
    val again = RetrievalOps.negativeSample(seen, cat, "u", "i", 4)
      .as[(Long, Long)].collect().toSet
    assert(out.toSet == again)
  }

  test("negativeSampleRejection: never a seen item, at most n per user, " +
    "distinct draws, re-run stable, duplicate catalog rows harmless") {
    val seen = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("u", "i")
    // sparse catalog (gap at 15..19): misses are rejected slots, and a
    // duplicated row must not duplicate a draw
    val cat = ((10L until 15L) ++ (20L until 30L) ++ Seq(10L)).toDF("i")
    val out = RetrievalOps.negativeSampleRejection(seen, cat, "u", "i", 4)
      .as[(Long, Long)].collect()
    val byUser = out.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(byUser.keySet.subsetOf(Set(1L, 2L)))
    byUser.values.foreach { items =>
      assert(items.length <= 4 && items.distinct.length == items.length)
      assert(items.forall(i => (10L until 15L) ++ (20L until 30L) contains i))
    }
    assert(!byUser.getOrElse(1L, Array.empty[Long]).exists(i => i == 10L || i == 11L))
    assert(!byUser.getOrElse(2L, Array.empty[Long]).contains(10L))
    // 32 slots over a 15-item catalog in a 30-wide id space: both
    // users must fill all 4 slots with overwhelming margin
    assert(byUser.values.forall(_.length == 4))
    val again = RetrievalOps.negativeSampleRejection(seen, cat, "u", "i", 4)
      .as[(Long, Long)].collect().toSet
    assert(out.toSet == again)
  }

  test("i2iPmi: frequent co-engagement scores above chance pairings") {
    // items 1,2 co-occur for 4 of 6 users; item 3 floats independently
    val ev = Seq(
      (1L, 1L, 10L), (1L, 2L, 11L), (2L, 1L, 10L), (2L, 2L, 12L),
      (3L, 1L, 10L), (3L, 2L, 13L), (4L, 1L, 10L), (4L, 2L, 14L),
      (5L, 1L, 10L), (5L, 3L, 15L), (6L, 2L, 10L), (6L, 3L, 16L))
      .toDF("u", "item", "ts")
    val out = RetrievalOps.i2iPmi(ev, "u", "item", "ts", 10, 2L, 5)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(out.contains((1L, 2L)))
    // c_ab=4, c_a=c_b=5, n_users=6 → pmi = ln(4·6/25)
    assert(math.abs(out((1L, 2L)) - math.log(24.0 / 25.0)) < 1e-6)
    // item 3's pairings never reach minPair=2 → absent
    assert(out.keySet == Set((1L, 2L)))
  }

  test("BM25: rare terms outweigh common ones; length normalization bites") {
    val docs = Seq(
      (1L, "rare word here filler filler filler"),
      (2L, "common word here filler filler filler"),
      (3L, "common word here filler filler filler plus lots more tokens " +
        "common common stretching document length well past average"),
      (4L, "common filler filler filler filler filler"),
      (5L, "filler only nothing else at all")).toDF("doc_id", "text")
    val out = RetrievalOps.bm25(docs, "doc_id", "text",
        Seq("rare", "common"), topK = 5)
      .as[(Long, Double)].collect()
    val score = out.toMap
    // df(rare)=1 vs df(common)=3 → doc 1 must beat every common-only doc.
    assert(out.head._1 == 1L)
    // doc 3 has MORE "common" hits but is much longer; doc 2's single
    // hit in a short doc must not be buried by doc 3's raw tf.
    assert(score(2L) > 0.0 && score(4L) > 0.0)
    assert(!score.contains(5L), "docs with no query term never appear")
    // tf saturation: doc 3's tf=3 gives < 3× doc 2's tf=1 contribution.
    assert(score(3L) < 3.0 * score(2L))
  }

  test("R3: hybrid sums boosted channel scores per (user, item)") {
    val term = RetrievalOps.termRecall(users, items, "user_id", "terms", "seen",
      "item_id", "terms", 0.1, 10)
      .withColumnRenamed("item_id", "item_id")
    val knn = RetrievalOps.knnRecall(users, items, "user_id", "vector", "seen",
      "item_id", "vector", 0.9, 10)
    val hybrid = RetrievalOps.hybridRecall(Seq(term, knn), "user_id", "item_id", 3)
      .as[(Long, Long, Double)].collect()
    val u1_11 = hybrid.find(r => r._1 == 1L && r._2 == 11L).get._3
    val termOnly = 0.2
    assert(u1_11 > termOnly)        // knn channel added on top of term channel
  }
}
