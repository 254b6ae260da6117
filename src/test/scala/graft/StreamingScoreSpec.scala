package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.SamplingOps
import graft.streaming.StreamingScore

/** The map-only streaming DSIR scorer must reproduce the batch
  * importance weights bit-for-bit for the same documents under the
  * same frozen model — the invariant that makes "train the model in
  * batch, score the firehose live" deployable — and must fall back to
  * the smoothed empty-bucket ratio for buckets the model never saw.
  */
class StreamingScoreSpec extends SparkSpec {
  import spark.implicits._

  test("stream scores == batch importanceWeights under the frozen " +
    "model; unseen buckets take the sentinel fallback") {
    val corpus = Seq(
      (0L, "alpha beta alpha beta alpha beta", "t"),
      (1L, "alpha beta gamma delta alpha beta", "t"),
      (2L, "omega psi omega psi omega psi", "r"),
      (3L, "omega psi chi phi omega psi", "r"),
      (4L, "alpha beta omega psi", "r"),
      (5L, "solo", "r")
    ).toDF("doc_id", "text", "grp")
    val B = 32
    val tgt = col("grp") === "t"

    val batch = SamplingOps.importanceWeights(corpus, "doc_id", "text",
        tgt, B)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

    val modelRows = SamplingOps.importanceModel(corpus, "text", tgt, B)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val default = modelRows(-1L)
    val model = modelRows - (-1L)
    assert(model.size <= B && model.nonEmpty)

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val scored = StreamingScore.importanceScore(
      mem.toDS().toDF("doc_id", "text"), "doc_id", "text",
      model, default, B)
    val q = scored.writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").start()
    mem.addData(corpus.select("doc_id", "text").as[(Long, String)]
      .collect().toSeq: _*)
    q.processAllAvailable()

    val streamed = spark.table("dsir_stream")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(streamed == batch,
      s"stream/batch divergence: $streamed vs $batch")
    assert(!streamed.contains(5L), "a 1-token doc must not be scored")

    // a document of entirely novel vocabulary: every bucket may be
    // unseen — the fallback must yield a finite non-null score
    mem.addData((99L, "novel tokens never seen before today"))
    q.processAllAvailable()
    val novel = spark.table("dsir_stream").filter(col("doc_id") === 99L)
      .collect()
    assert(novel.length == 1 &&
      !novel(0).isNullAt(2) && !novel(0).getDouble(2).isNaN)
    q.stop()
  }
}
