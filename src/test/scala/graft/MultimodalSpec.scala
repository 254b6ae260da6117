package graft

import org.apache.spark.sql.functions._
import graft.operators.MultimodalOps

/** Multimodal plumbing: batched decode contract, frame sampling, resize
  * arithmetic — on binary payloads built from document text.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq(
    (1L, "abcdefgh" * 4),   // 32 bytes
    (2L, "zzzz"),           // 4 bytes
    (3L, ""))               // empty payload
    .toDF("id", "text")
    .withColumn("payload", encode($"text", "UTF-8"))

  test("extractFeatures: fixed-dim normalized features, batch-size independent") {
    val f1 = MultimodalOps.extractFeatures(media, "id", "payload", batchSize = 1)
      .collect().map(m => m.id -> m.features.toSeq).toMap
    val f64 = MultimodalOps.extractFeatures(media, "id", "payload", batchSize = 64)
      .collect().map(m => m.id -> m.features.toSeq).toMap
    assert(f1 == f64)                       // batch shape never changes results
    assert(f1(1L).length == MultimodalOps.FEATURE_DIM)
    assert(math.abs(f1(1L).sum - 1.0) < 1e-6)   // normalized histogram
    assert(f1(3L).forall(_ == 0f))          // empty payload → zero vector
  }

  test("extractFeatures carries byte-length metadata") {
    val out = MultimodalOps.extractFeatures(media, "id", "payload")
      .collect().map(m => m.id -> m.n_bytes).toMap
    assert(out == Map(1L -> 32L, 2L -> 4L, 3L -> 0L))
  }

  test("frameSample keeps every stride-th fixed-size frame") {
    val out = MultimodalOps.frameSample(media.filter($"id" === 1L), "payload",
        frameBytes = 8, stride = 2)
      .select("frames").as[Seq[Array[Byte]]].head()
    assert(out.length == 2)                 // frames 0 and 2 of 4
    assert(new String(out.head, "UTF-8") == "abcdefgh")
  }

  test("frameSample yields no frames for payloads shorter than one frame") {
    val out = MultimodalOps.frameSample(media, "payload", frameBytes = 8, stride = 1)
      .select("id", "frames").as[(Long, Seq[Array[Byte]])].collect()
      .map(r => r._1 -> r._2.length).toMap
    assert(out == Map(1L -> 4, 2L -> 0, 3L -> 0))   // 4-byte and empty payloads → []
  }

  test("resizePlan preserves aspect ratio and never upscales") {
    val dims = Seq((1L, 4000, 2000), (2L, 100, 50)).toDF("id", "w", "h")
    val out = MultimodalOps.resizePlan(dims, "w", "h", 1000)
      .select("id", "out_w", "out_h").as[(Long, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((1000, 500)))
    assert(out(2L) == ((100, 50)))
  }
}
