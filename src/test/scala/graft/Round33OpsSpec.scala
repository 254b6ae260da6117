package graft

import org.apache.spark.sql.functions._
import graft.operators.{EncodeOps, GraphOps, SketchOps, TextOps}

/** Round-33 specs: assortativity −1 on a star, hashing-trick
  * collisions against an in-test md5 replica, threshold-transfer
  * quantile matching across a short-form source, AMS F₂ exactness on
  * a one-key stream, and the corpus-build manifest arithmetic.
  */
class Round33OpsSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  test("assortativity: a star is perfectly disassortative (−1)") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val r = GraphOps.assortativity(edges, "a", "b").collect()(0)
    assert(r.getAs[Long]("n_nodes") == 4L)
    assert(r.getAs[Long]("n_edges") == 3L)
    assert(r.getAs[Double]("assortativity") == -1.0)
  }

  test("hashCollisionAudit: bucket occupancy matches the md5 replica") {
    val df = Seq(("a", 1L), ("b", 2L), ("c", 3L), ("a", 1L))
      .toDF("t", "u")
    val out = EncodeOps.hashCollisionAudit(df, Seq("t", "u"),
        Seq(2, 16))
      .orderBy("bits").collect()
    val hs = Seq("a|1", "b|2", "c|3")
      .map(k => java.lang.Long.parseLong(md5hex(k).take(8), 16))
    for (r <- out) {
      val b = r.getAs[Long]("bits").toInt
      val expected = hs.map(_ % (1L << b)).distinct.size
      assert(r.getAs[Long]("n_crosses") == 3L)
      assert(r.getAs[Long]("n_buckets_hit") == expected.toLong)
      assert(r.getAs[Long]("n_collided") == 3L - expected)
    }
  }

  test("thresholdTransfer: a short-form source gets a lower cutoff " +
    "at matched selectivity") {
    val df = Seq(
      ("A", "w w"), ("A", "w w w"), ("A", "w w w w"),
      ("A", "w w w w w"),
      ("B", "w"), ("B", "w"), ("B", "w"),
      ("B", (1 to 10).map(_ => "w").mkString(" "))
    ).toDF("source", "text")
    val out = TextOps.thresholdTransfer(df, "source", "text",
        globalMin = 3)
      .orderBy("source").collect()
    // global keep(len ≥ 3) = 4/8 = 500000 ppm
    val a = out(0)
    assert(a.getAs[Long]("global_keep_ppm") == 500000L)
    assert(a.getAs[Long]("threshold_tokens") == 4L)
    assert(a.getAs[Long]("achieved_keep_ppm") == 500000L)
    val b = out(1)
    assert(b.getAs[Long]("threshold_tokens") == 1L)
    assert(b.getAs[Long]("achieved_keep_ppm") == 1000000L)
  }

  test("amsF2: a single-key stream estimates its own F2 exactly") {
    val df = Seq("a", "a", "a").toDF("token")
    val r = SketchOps.amsF2(df, "token", 8).collect()(0)
    assert(r.getAs[Long]("exact_f2") == 9L)
    assert(r.getAs[Long]("est_f2") == 9L)
    assert(r.getAs[Long]("err_ppm") == 0L)
  }

  test("corpus_build manifest arithmetic: pass gate, cluster-atomic " +
    "eval, packing") {
    val passDoc = (1 to 39).map(i => f"alp$i%02d").mkString(" ") + " the"
    val df = Seq((10L, "s", passDoc), (11L, "s", passDoc),
      (12L, "s", "x x x")).toDF("doc_id", "source", "text")
    val q = SparkEntry.queries("q426_corpus_build")
    // run the same composition on a temp dir layout
    val dir = java.nio.file.Files.createTempDirectory("graft_cb")
      .toString
    val tables = Seq("region", "nation", "customer", "supplier",
      "part", "orders", "lineitem", "events", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .limit(0).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = q(spark, dir).collect()
    val mem = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest("10".getBytes("UTF-8"))
        .take(4).map(x => f"$x%02x").mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    }
    if (mem >= 0.9) {
      // the whole pass family is eval → no packed rows → no manifest
      assert(out.isEmpty)
    } else {
      assert(out.length == 1)
      val r = out(0)
      assert(r.getAs[Long]("n_pass") == 2L)
      assert(r.getAs[Long]("n_train") == 2L)
      assert(r.getAs[Long]("n_eval") == 0L)
      // 80 train tokens at budget 256 → one bin, fill 80/256
      assert(r.getAs[Long]("n_bins") == 1L)
      assert(r.getAs[Long]("n_train_tokens") == 80L)
      assert(r.getAs[Long]("fill_ppm") == 312500L)
    }
  }
}
