package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: images/audio/video ride through the
  * engine as opaque `binary` payloads with typed metadata columns;
  * decode / feature-extract / resize / frame-sample run as batched
  * per-partition transforms.
  *
  * The actual codec step is STUBBED (this container ships no
  * image/audio libraries): [[StubDecoder.decode]] derives a
  * deterministic 16-bin byte histogram standing in for "decode +
  * embed". Everything around it — the payload schema, the partition
  * batching shape (decoder libraries amortize per-batch setup), the
  * fixed-dim feature contract, and the frame sampling — is the real
  * production plumbing: swap `StubDecoder.decode` for a JNI/codec call
  * and nothing else changes.
  *
  * Scale: mapPartitions keeps decode zero-shuffle (features computed
  * where the bytes already live); payloads never pass through a wide
  * transform, so shuffle volume stays at metadata width. For skewed
  * payload sizes, `repartitionByBytes` rebalances on a size column
  * before the decode stage.
  */
object MultimodalOps {

  val FEATURE_DIM = 16

  case class MediaRow(id: Long, payload: Array[Byte])
  case class MediaFeatures(id: Long, n_bytes: Long, features: Array[Float])

  /** Deterministic stand-in for an image/audio decoder. */
  object StubDecoder {
    /** ??? real decoder goes here — byte histogram as the fake embed. */
    def decode(batch: Seq[Array[Byte]]): Seq[Array[Float]] =
      batch.map { bytes =>
        val hist = new Array[Float](FEATURE_DIM)
        var i = 0
        while (i < bytes.length) {
          hist((bytes(i) & 0xff) % FEATURE_DIM) += 1f
          i += 1
        }
        val n = math.max(1, bytes.length).toFloat
        hist.map(_ / n)
      }
  }

  /** Batched per-partition decode + feature extraction. `batchSize`
    * bounds decoder working-set memory (the Triton max_batch_size
    * analogue — online/utils/triton_caller.py:33-38).
    */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    implicit val inEnc = Encoders.product[MediaRow]
    df.select(col(idCol).as("id"), col(payloadCol).as("payload")).as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val feats = StubDecoder.decode(batch.map(_.payload))
          batch.iterator.zip(feats.iterator).map { case (r, f) =>
            MediaFeatures(r.id, r.payload.length.toLong, f)
          }
        }
      }
  }

  /** Frame sampling: treat the payload as fixed-size frames, keep every
    * `stride`-th frame (deterministic, no decode needed). Column-level
    * (codegen'd) — the payload is sliced, never exploded row-wise until
    * the caller asks.
    */
  def frameSample(df: DataFrame, payloadCol: String, frameBytes: Int,
                  stride: Int, outCol: String = "frames"): DataFrame =
    // Payloads shorter than one full frame yield [] — the guard matters
    // because sequence(0, -1) is the DESCENDING sequence [0, -1], which
    // would emit a partial frame and a negative-index read.
    df.withColumn(outCol,
      expr(s"""CASE WHEN octet_length($payloadCol) < $frameBytes
          THEN CAST(array() AS ARRAY<BINARY>)
          ELSE transform(
            filter(sequence(0, CAST(octet_length($payloadCol) / $frameBytes AS INT) - 1),
                   i -> i % $stride = 0),
            i -> substring($payloadCol, i * $frameBytes + 1, $frameBytes)) END"""))

  /** Aspect-preserving resize metadata (the shape arithmetic a real
    * resize kernel would receive).
    */
  def resizePlan(df: DataFrame, wCol: String, hCol: String,
                 maxSide: Int): DataFrame =
    df.withColumn("scale",
        when(greatest(col(wCol), col(hCol)) <= maxSide, lit(1.0))
          .otherwise(lit(maxSide.toDouble) / greatest(col(wCol), col(hCol))))
      .withColumn("out_w", floor(col(wCol) * col("scale")).cast("int"))
      .withColumn("out_h", floor(col(hCol) * col("scale")).cast("int"))

  /** Payload-skew rebalance before decode: hash-spread on the id so no
    * partition accumulates the large payloads that arrive clustered in
    * the source files (AQE's skew handling only fixes join/agg skew,
    * not mapPartitions input skew).
    */
  def rebalance(df: DataFrame, idCol: String, partitions: Int): DataFrame =
    df.repartition(partitions, col(idCol))
}
