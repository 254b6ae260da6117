package graft

import graft.operators.SimilarityOps

/** Trained-IVF quantizer specs (q440/q441): exact-integer Lloyd on a
  * hand-computed fixture, and the probe-covers-everything equivalence
  * to the exact baseline.
  */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  // Two clean 2-D clusters around (±1, 0). md5 ranks of the string ids
  // "1".."6" put ids 6 then 4 first (verified by hand against the hex
  // digests) — so BOTH seeds start inside cluster B, the adversarial
  // init: round 1 lumps all of cluster A plus id 4/5 onto seed 4, and
  // the exact-integer Lloyd update must still recover the true
  // centroids (±1e6, 0) by round 2.
  private val vecs = Seq(
    1L -> Seq(1.0f, 0.0f), 2L -> Seq(0.9f, 0.1f), 3L -> Seq(1.1f, -0.1f),
    4L -> Seq(-1.0f, 0.0f), 5L -> Seq(-0.9f, -0.1f), 6L -> Seq(-1.1f, 0.1f))

  private def df = vecs.toDF("vec_id", "embedding")

  test("ivfTrain: adversarial same-cluster seeds converge to the true " +
    "integer centroids in two rounds; census is exact") {
    val out = SimilarityOps.ivfTrain(df, "vec_id", "embedding", kCent = 2)
      .collect().map(r => (r.getAs[Long]("cid"),
      r.getAs[Long]("n_members"), r.getAs[Long]("centroid_l1"),
      r.getAs[Long]("shift_l1")))
    // hand trace (ppm ints): seeds c0 = {4: (-1e6, 0), 6: (-1.1e6, 1e5)};
    // round-1 assign pulls 1/2/3/4/5 onto cid 4 -> c1 = {4: (220000,
    // -20000), 6: (-1100000, 100000)} (floor-division means); round-2
    // assign splits the clusters correctly -> c2 = {4: (1000000, 0),
    // 6: (-1000000, 0)}; final members 3+3; shifts |c2-c1| per dim.
    assert(out.toSeq == Seq(
      (4L, 3L, 1000000L, 800000L),
      (6L, 3L, 1000000L, 200000L)))
  }

  test("ivfAnnTopK: nprobe covering every trained cell equals the " +
    "exact cosine baseline") {
    val ann = SimilarityOps.ivfAnnTopK(df, "vec_id", "embedding",
        k = 2, kCent = 2, nprobe = 2)
      .orderBy("vec_id", "neighbor_id").collect().toSeq
    val exact = SimilarityOps.cosineTopK(df, "vec_id", "embedding", 2)
      .orderBy("vec_id", "neighbor_id").collect().toSeq
    assert(ann == exact)
  }

  test("ivfRecallAudit: probing every trained cell reaches exact " +
    "recall; levels are monotone") {
    val out = SimilarityOps.ivfRecallAudit(df, "vec_id", "embedding",
        k = 2, kCent = 2, sampleMod = 1)
      .orderBy("nprobe")
      .collect().map(r => (r.getAs[Long]("nprobe"),
        r.getAs[Long]("n_queries"), r.getAs[Long]("recall_ppm")))
    assert(out.length == 3 && out.forall(_._2 == 6L))
    // with only 2 trained cells, nprobe >= 2 covers the whole corpus
    // -> the candidate top-k IS the exact top-k
    assert(out(1)._3 == 1000000L && out(2)._3 == 1000000L)
    assert(out(0)._3 <= out(1)._3)
  }

  test("ivfTrain: kCent larger than the corpus keeps every vector a " +
    "surviving singleton cell with zero shift") {
    val out = SimilarityOps.ivfTrain(df, "vec_id", "embedding",
      kCent = 10).collect()
    assert(out.length == 6)
    assert(out.forall(r => r.getAs[Long]("n_members") == 1L &&
      r.getAs[Long]("shift_l1") == 0L))
  }
}
