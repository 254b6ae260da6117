package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, MixtureOps, SimilarityOps, TextOps}

/** Round-26 specs: the positional-novelty decile arithmetic, the
  * lang-confusion grid shares, embedding drift on hand-placed
  * centroids, dup-by-length attribution and lift, MinHash fidelity on
  * an identical pair (exact zero error), and the salted-sampler audit
  * against a from-scratch MessageDigest replica of the draws.
  */
class Round26OpsSpec extends SparkSpec {
  import spark.implicits._

  test("positionNovelty: first-occurrence flags land in the right " +
    "position deciles") {
    val df = Seq((1L, "a b a b"), (2L, "c")).toDF("doc_id", "text")
    val out = TextOps.positionNovelty(df, "doc_id", "text")
      .orderBy("decile").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc1 len 4: positions 0..3 -> deciles 0,2,5,7; new at 0,1 only.
    // doc2 len 1: position 0 -> decile 0, new.
    assert(out.toSeq == Seq((0L, 2L, 2L, 1000000L),
      (2L, 1L, 1L, 1000000L), (5L, 1L, 0L, 0L), (7L, 1L, 0L, 0L)))
  }

  test("langConfusion: grid counts and half-up row-share ppm") {
    val profiles = Seq(
      "sql" -> Seq("join"), "infra" -> Seq("spark"),
      "data" -> Seq("data"))
    val df = Seq(("es", "join join"), ("es", "data"), ("zh", "spark"))
      .toDF("lang", "text")
    val out = TextOps.langConfusion(df, "lang", "text", profiles)
      .orderBy("lang", "lang_pred").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq == Seq(("es", "data", 1L, 500000L),
      ("es", "sql", 1L, 500000L), ("zh", "infra", 1L, 1000000L)))
  }

  test("embeddingDrift: centroid cosine and norm delta on hand-placed" +
    " vectors") {
    val old = Seq((1L, Seq(1.0f, 0.0f), 1), (2L, Seq(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val nw = Seq((3L, Seq(1.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.embeddingDrift(old, nw, "vec_id",
      "embedding", "label").collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(0) == 1L)
    assert(r.getAs[Long]("n_old") == 2L)
    assert(r.getAs[Long]("n_new") == 1L)
    // old centroid (0.5, 0.5) norm sqrt(0.5); new (1, 0) norm 1
    assert(r.getAs[Double]("centroid_cos") == 0.707107)
    assert(r.getAs[Double]("norm_delta") == 0.292893)
  }

  test("dupLengthProfile: dup load per length decile with corpus lift") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y y"), (4L, "z z z"))
      .toDF("doc_id", "text")
    val out = DedupOps.dupLengthProfile(df, "doc_id", "text")
      .orderBy("len_decile").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getAs[Double]("lift")))
    // ranks by (len, id): d1,d2,d3,d4 -> deciles 0,2,5,7; corpus dup
    // rate 2/4, so an all-dup decile lifts 2.0
    assert(out.toSeq == Seq((0L, 1L, 1L, 1000000L, 2.0),
      (2L, 1L, 1L, 1000000L, 2.0), (5L, 1L, 0L, 0L, 0.0),
      (7L, 1L, 0L, 0L, 0.0)))
  }

  test("minhashFidelity: an identical pair estimates jaccard exactly " +
    "at every signature size") {
    val df = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "zz"))
      .toDF("doc_id", "text")
    val out = DedupOps.minhashFidelity(df, "doc_id", "text")
      .orderBy("n_hashes").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("mae"),
        r.getAs[Double]("bias")))
    // identical shingle sets -> identical signatures -> the (1,2)
    // candidate has j = 1 and est = 1 for every h; doc 3 has no
    // shingles (1 token) and cannot pair
    assert(out.toSeq == Seq((2L, 1L, 0.0, 0.0), (4L, 1L, 0.0, 0.0),
      (8L, 1L, 0.0, 0.0)))
  }

  test("sampleOverlap: counts match a from-scratch MessageDigest " +
    "replica of the salted draws") {
    val ids = (0L until 100L).toSeq
    val df = ids.toDF("doc_id")
    def draw(salt: String, id: Long): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt|$id".getBytes("UTF-8"))
      val hex = d.take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    }
    val rates = Seq(1, 5, 10, 25)
    val exp = rates.map { p =>
      val na = ids.count(draw("a", _) < p / 100.0).toLong
      val nb = ids.count(draw("b", _) < p / 100.0).toLong
      val both = ids.count(i =>
        draw("a", i) < p / 100.0 && draw("b", i) < p / 100.0).toLong
      val n = ids.length.toLong
      (p.toLong, na, nb, both, (both * 2000000L + n) / (2 * n),
        (na * nb * 2000000L + n * n) / (2 * n * n))
    }
    val out = MixtureOps.sampleOverlap(df, "doc_id", rates)
      .orderBy("rate_pct").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == exp)
  }
}
