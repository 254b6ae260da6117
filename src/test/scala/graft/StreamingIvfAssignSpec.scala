package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps
import graft.streaming.StreamingIvfAssign

/** The map-only streaming IVF assigner must route vectors to exactly
  * the cells the batch assignment picks under the same frozen codebook
  * — the train-batch / serve-stream split for the q440 quantizer — and
  * must break exact-distance ties toward the smaller cid independent
  * of codebook order (the batch min(struct(d, cid)) contract).
  */
class StreamingIvfAssignSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    1L -> Seq(1.0f, 0.0f), 2L -> Seq(0.9f, 0.1f), 3L -> Seq(1.1f, -0.1f),
    4L -> Seq(-1.0f, 0.0f), 5L -> Seq(-0.9f, -0.1f), 6L -> Seq(-1.1f, 0.1f))

  test("stream assignments == the trained codebook's batch cells; " +
    "ties go to the smaller cid regardless of codebook order") {
    val df = vecs.toDF("vec_id", "embedding")
    // the IvfSpec fixture's converged round-2 codebook, collected the
    // way a serving layer would freeze it
    val codebook = SimilarityOps.ivfCodebook(df, "vec_id", "embedding", 2)
      .collect()
      .map(r => r.getAs[Long]("cid") ->
        r.getAs[scala.collection.Seq[Long]]("cemb").toSeq).toSeq
    assert(codebook.map(_._1).sorted == Seq(4L, 6L))

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val out = StreamingIvfAssign.assign(
      mem.toDS().toDF("vec_id", "embedding"), "vec_id", "embedding",
      codebook)
    val q = out.writeStream.format("memory").queryName("ivf_stream")
      .outputMode("append").start()
    mem.addData(vecs: _*)
    q.processAllAvailable()
    val streamed = spark.table("ivf_stream")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the hand-traced final assignment from IvfSpec
    assert(streamed == Map(1L -> 4L, 2L -> 4L, 3L -> 4L,
      4L -> 6L, 5L -> 6L, 6L -> 6L))

    // an exactly equidistant vector (0, 0) must pick the SMALLER cid,
    // and must do so for both codebook orders
    mem.addData(100L -> Seq(0.0f, 0.0f))
    q.processAllAvailable()
    val tie = spark.table("ivf_stream").filter(col("vec_id") === 100L)
      .collect()
    assert(tie.length == 1 && tie(0).getLong(1) == 4L)
    q.stop()

    val rev = StreamingIvfAssign.assign(
      Seq(100L -> Seq(0.0f, 0.0f)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", codebook.reverse)
    assert(rev.collect().head.getLong(1) == 4L)
  }
}
