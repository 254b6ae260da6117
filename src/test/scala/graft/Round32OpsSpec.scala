package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, GraphOps, RetrievalOps, SimilarityOps, TextOps}

/** Round-32 specs: phrase-merge selection and greedy-overlap rewrite
  * semantics, BFS hop census on a chain, snapshot-rotation Jaccard,
  * MMR diversity flip on a hand-placed redundant pair, and COEC = 1
  * when positions fully explain the positives.
  */
class Round32OpsSpec extends SparkSpec {
  import spark.implicits._

  test("phraseMerges: picks the top pair per round and re-merges " +
    "merged units") {
    val df = Seq((1L, "x y"), (2L, "x y"), (3L, "x z"))
      .toDF("doc_id", "text")
    val out = TextOps.phraseMerges(df, "text", steps = 5)
      .orderBy("step").collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[String]("w1"),
        r.getAs[String]("w2"), r.getAs[Long]("n_occ")))
    assert(out.toSeq == Seq((1L, "x", "y", 2L), (2L, "x", "z", 1L)))
  }

  test("phraseMerges: overlapping occurrences merge greedily " +
    "left-to-right (word2phrase semantics)") {
    val df = Seq((1L, "a a a")).toDF("doc_id", "text")
    val out = TextOps.phraseMerges(df, "text", steps = 5)
      .orderBy("step").collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[String]("w1"),
        r.getAs[String]("w2"), r.getAs[Long]("n_occ")))
    // round 1 counts both (a,a) bigrams but the rewrite consumes the
    // first; round 2 merges the remainder
    assert(out.toSeq == Seq((1L, "a", "a", 2L), (2L, "a@a", "a", 1L)))
  }

  test("phraseMerges: duplicate texts fold into the weighted distinct " +
    "table; per-round checkpoints hold only pair-containing rows") {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    // 100 copies of "p q" dominate the pair counts; 50 distinct texts
    // never contain the selected pairs, so every post-round-0
    // checkpoint must be bounded by the 1-2 affected DISTINCT rows —
    // not the 150-row corpus, and not even the 51-row distinct table.
    val dup = Seq.fill(100)("p q r")
    val rest = (1 to 50).map(i => s"solo$i")
    val df = (dup ++ rest).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextOps.phraseMerges(df, "text", steps = 2)
      .orderBy("step").collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[String]("w1"),
        r.getAs[String]("w2"), r.getAs[Long]("n_occ")))
    // weights carry multiplicity: 100 occurrences each round
    assert(out.toSeq == Seq((1L, "p", "q", 100L),
      (2L, "p@q", "r", 100L)))
    // round-0 distinct table = 51 rows; the 2 per-round deltas = 1 row
    // each (the single distinct pair-containing text). The async
    // ContextCleaner may GC-unpersist entries between the run and this
    // read, so assert removal-monotone bounds rather than the exact
    // multiset: nothing may exceed the 51-row distinct table (the
    // 150-row corpus must never checkpoint), and at most ONE
    // checkpoint (round 0) may exceed the 1-row delta bound.
    val sizes = spark.sparkContext.getPersistentRDDs.values
      .map(_.count()).toSeq.sorted
    assert(sizes.forall(_ <= 51L),
      s"a checkpoint holds more than the distinct table: $sizes")
    assert(sizes.count(_ > 1L) <= 1,
      s"per-round checkpoints must hold only affected rows, got $sizes")
  }

  test("bfsHops: chain distances from the seed; isolates land in -1") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    val seeds = Seq(1L).toDF("id")
    val out = GraphOps.bfsHops(nodes, "id", edges, "s", "d", seeds,
        "id", maxHops = 2)
      .orderBy("hop").collect()
      .map(r => (r.getAs[Long]("hop"), r.getAs[Long]("n_nodes")))
    assert(out.toSeq == Seq((-1L, 2L), (0L, 1L), (1L, 1L), (2L, 1L)))
  }

  test("snapshotRotation: per-source content-set Jaccard") {
    val old = Seq((1L, "s", "a a a"), (2L, "s", "b b b"))
      .toDF("doc_id", "source", "text")
    val nw = Seq((3L, "s", "b b b"), (4L, "s", "c c c"))
      .toDF("doc_id", "source", "text")
    val r = DedupOps.snapshotRotation(old, nw, "source", "text")
      .collect()(0)
    assert(r.getAs[Long]("n_old") == 2L)
    assert(r.getAs[Long]("n_new") == 2L)
    assert(r.getAs[Long]("n_common") == 1L)
    assert(r.getAs[Long]("jaccard_ppm") == 333333L)
  }

  test("mmrRerank: a diverse candidate beats the redundant twin at " +
    "rank 2") {
    val emb = Seq(
      (0L, Seq(1.0f, 1.0f, 0.0f, 0.0f)),  // query direction (1,1)
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),  // exact twin of 1
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f))   // orthogonal to 1/2
    ).toDF("vec_id", "embedding")
    val out = SimilarityOps.mmrRerank(emb, "vec_id", "embedding",
        m = 5, k = 3, signBits = 4)
      .filter(col("vec_id") === 0L)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("selected"),
        r.getAs[Double]("score")))
    // sims to the query are all 1/√2 = 0.707107; rank 1 ties break to
    // id 1; rank 2 prefers the orthogonal 3 (pair sim 0) over the
    // twin 2 (pair sim 1); rank 3 takes the twin at 0.707107 − 0.5
    assert(out.toSeq == Seq((1L, 1L, 0.707107),
      (2L, 3L, 0.707107), (3L, 2L, 0.207107)))
  }

  test("positionCoec: positives fully explained by position give " +
    "COEC exactly 1") {
    val df = Seq(
      ("a", 5L, 150.0), ("a", 6L, 50.0),
      ("b", 15L, 150.0), ("b", 16L, 150.0)
    ).toDF("event_type", "k", "value")
    val out = RetrievalOps.positionCoec(df, "event_type", col("k"),
        col("value") > 100)
      .orderBy("segment").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_pos") == 1L)
    assert(out(0).getAs[Long]("expected_ppm_sum") == 1000000L)
    assert(out(0).getAs[Long]("coec_ppm") == 1000000L)
    assert(out(1).getAs[Long]("n_pos") == 2L)
    assert(out(1).getAs[Long]("coec_ppm") == 1000000L)
  }
}
