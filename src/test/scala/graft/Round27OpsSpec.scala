package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, SimilarityOps, TextOps}

/** Round-27 specs: near-dup cluster purity attribution, the hubness
  * in-degree histogram on hand-placed vectors, Gopher pass-rate drift
  * between explicit snapshots, per-source cohesion through the
  * documents join, metadata-consistency arithmetic, and the OOV
  * transfer rate under a pinned top-V vocabulary.
  */
class Round27OpsSpec extends SparkSpec {
  import spark.implicits._

  private val passDoc =
    (1 to 39).map(i => f"alp$i%02d").mkString(" ") + " the"

  test("neardupClusterPurity: a cross-source copy cluster lands in " +
    "the n_sources=2 row; singletons are dropped") {
    val df = Seq(
      (1L, "a b c d", "A"), (2L, "a b c d", "A"), (3L, "a b c d", "B"),
      (4L, "x y z", "A"), (5L, "p q r", "B")
    ).toDF("doc_id", "text", "source")
    val out = DedupOps.neardupClusterPurity(df, "doc_id", "source",
        "text")
      .orderBy("n_sources").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq == Seq((2L, 1L, 3L, 3L)))
  }

  test("hubnessAudit: in-degree histogram counts hubs and anti-hubs") {
    // three copies of +e1 and one -e1: every top-1 list points at the
    // lowest-id copy it can reach, so v1 collects 3, v2 one, v3/v4 none
    val df = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (4L, Seq(-1.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = SimilarityOps.hubnessAudit(df, "vec_id", "embedding", 1, 4)
      .orderBy("in_degree").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((0L, 2L), (1L, 1L), (3L, 1L)))
  }

  test("qualityDelta: per-source pass ppm on both snapshots and the " +
    "signed delta; one-sided sources drop") {
    val old = Seq((1L, passDoc, "A"), (2L, "x x x", "A"),
      (3L, "y y", "B")).toDF("doc_id", "text", "source")
    val nw = Seq((4L, passDoc, "A")).toDF("doc_id", "text", "source")
    val out = TextOps.qualityDelta(old, nw, "source", "doc_id", "text",
      Seq("the", "a")).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getString(0) == "A")
    assert(r.getAs[Long]("n_old") == 2L)
    assert(r.getAs[Long]("n_new") == 1L)
    assert(r.getAs[Long]("pass_ppm_old") == 500000L)
    assert(r.getAs[Long]("pass_ppm_new") == 1000000L)
    assert(r.getAs[Long]("delta_ppm") == 500000L)
  }

  test("source cohesion wiring: isotropyAudit keyed by the documents " +
    "join gives per-source mean pairwise cosine") {
    val docs = Seq((1L, "A"), (2L, "A"), (3L, "B"))
      .toDF("doc_id", "source")
    val emb = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(3.0f, 4.0f))).toDF("vec_id", "embedding")
    val out = SimilarityOps.isotropyAudit(
        emb.join(docs, emb("vec_id") === docs("doc_id")),
        "embedding", "source")
      .withColumnRenamed("label", "source")
      .orderBy("source").collect()
    val a = out(0)
    assert(a.getString(0) == "A" && a.getAs[Long]("n_vecs") == 2L)
    // orthogonal unit pair: (||u1+u2||^2 - 2) / (2*1) = 0
    assert(a.getAs[Double]("mean_pairwise_cos") == 0.0)
    val b = out(1)
    assert(b.getString(0) == "B" && b.getAs[Long]("n_vecs") == 1L)
    assert(b.getAs[Double]("mean_norm") == 5.0)
    assert(b.isNullAt(b.fieldIndex("mean_pairwise_cos")))
  }

  test("metadataConsistency: mismatch count, half-up ppm, max abs " +
    "delta per source") {
    val df = Seq(("A", "abc", 3L), ("A", "ab", 5L), ("B", "x", 1L))
      .toDF("source", "text", "n_chars")
    val out = TextOps.metadataConsistency(df, "source", "text",
        "n_chars")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(("A", 2L, 1L, 500000L, 3L),
      ("B", 1L, 0L, 0L, 0L)))
  }

  test("oovTransfer: top-V vocabulary from the vocab side, per-source" +
    " OOV ppm on the eval side") {
    val vocab = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    // counts: a=3, b=1, c=1 -> top-2 = {a, b} (count desc, token asc)
    val eval = Seq(("S", "a c"), ("T", "b b d")).toDF("source", "text")
    val out = TextOps.oovTransfer(vocab, eval, "source", "text", 2)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq == Seq(("S", 2L, 1L, 500000L),
      ("T", 3L, 1L, 333333L)))
  }
}
