package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, ExperimentOps, SimilarityOps, TextOps}

/** Round-31 specs: deletion blast radius with an explicit delete
  * flag, kNN noise-matrix majority votes and tiebreaks, temporal
  * straddle arithmetic, cluster-atomic split assignment, MaxSim
  * late-interaction scoring on hand-placed groups, and the scaling
  * proxy's add-one cross-entropy on a two-doc corpus.
  */
class Round31OpsSpec extends SparkSpec {
  import spark.implicits._

  private def membership(id: Long): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
  }

  test("deletionRadius: a deleted doc with a surviving twin is " +
    "residual; a deleted unique is not") {
    val dup = "alpha beta gamma delta epsilon"
    val df = Seq(
      (1L, "s", dup), (2L, "s", dup),
      (3L, "s", "zeta eta theta iota kappa")
    ).toDF("doc_id", "source", "text")
    val r = DedupOps.deletionRadius(df, "doc_id", "source", "text",
      col("doc_id").isin(1L, 3L), 0.5).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_deleted") == 2L)
    assert(r(0).getAs[Long]("n_residual") == 1L)
    assert(r(0).getAs[Long]("residual_ppm") == 500000L)
  }

  test("noiseMatrix: kNN majority with the smaller-label tiebreak " +
    "fills the joint") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (3L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.noiseMatrix(emb, "vec_id", "embedding",
        "label", 2)
      .orderBy("given_label", "predicted_label").collect()
      .map(r => (r.getAs[Long]("given_label"),
        r.getAs[Long]("predicted_label"), r.getAs[Long]("n_vectors"),
        r.getAs[Long]("class_share_ppm")))
    // v1/v2: neighbor labels {0,1} tie → smaller label 0; v3: {0,0}
    assert(out.toSeq == Seq((0L, 0L, 2L, 1000000L),
      (1L, 0L, 1L, 1000000L)))
  }

  test("temporalSplitAudit: a user active on both sides of the " +
    "midpoint straddles") {
    val df = Seq(
      ("x", 1L, Timestamp.valueOf("2024-01-01 00:00:00")),
      ("x", 1L, Timestamp.valueOf("2024-01-01 00:00:10")),
      ("x", 2L, Timestamp.valueOf("2024-01-01 00:00:01"))
    ).toDF("event_type", "user_id", "ts")
    val r = ExperimentOps.temporalSplitAudit(df, "user_id", "ts",
      "event_type").collect()(0)
    assert(r.getAs[Long]("n_entities") == 2L)
    assert(r.getAs[Long]("n_straddling") == 1L)
    assert(r.getAs[Long]("straddle_ppm") == 500000L)
    assert(r.getAs[Long]("n_before") == 2L)
    assert(r.getAs[Long]("n_after") == 1L)
  }

  test("clusterSplit: a copy-family is assigned atomically by its " +
    "cluster label's draw") {
    val dup = "alpha beta gamma delta epsilon"
    val df = Seq(
      (10L, "s", dup), (11L, "s", dup),
      (12L, "s", "zeta eta theta iota kappa")
    ).toDF("doc_id", "source", "text")
    val r = DedupOps.clusterSplit(df, "doc_id", "source", "text", 0.1)
      .collect()(0)
    // family {10, 11} has label 10; singleton 12 has label 12
    val famEval = if (membership(10L) >= 0.9) 2L else 0L
    val single = if (membership(12L) >= 0.9) 1L else 0L
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("n_eval") == famEval + single)
  }

  test("maxsimRetrieval: identical 2-vector groups score Σ max = 2") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = SimilarityOps.maxsimRetrieval(emb, "vec_id", "embedding",
        groupSize = 2, k = 3, signBits = 4, queryMod = 1)
      .orderBy("qgroup", "cgroup").collect()
      .map(r => (r.getAs[Long]("qgroup"), r.getAs[Long]("cgroup"),
        r.getAs[Double]("score")))
    assert(out.toSeq == Seq((0L, 1L, 2.0), (1L, 0L, 2.0)))
  }

  test("scalingProxy: add-one unigram cross-entropy on a two-doc " +
    "corpus matches the closed form") {
    val trainId = (1L to 500L).find(i => (membership(i) * 10).toInt < 9).get
    val evalId = (1L to 500L).find(i => (membership(i) * 10).toInt == 9).get
    val df = Seq((trainId, "a a b"), (evalId, "a c"))
      .toDF("doc_id", "text")
    val out = TextOps.scalingProxy(df, "doc_id", "text", 10).collect()
    // slices before the train doc's decile have no model → no row
    val d = (membership(trainId) * 10).toInt
    assert(out.length == 9 - d)
    // N=3, V=2: P(a) = 3/6, P(c) = 1/6 → H = (ln2 + ln6)/2 = 1.242453
    assert(out.forall(_.getAs[Double]("cross_entropy_nats") == 1.242453))
    assert(out.forall(_.getAs[Long]("n_train_tokens") == 3L))
    assert(out.forall(_.getAs[Long]("n_eval_tokens") == 2L))
  }
}
