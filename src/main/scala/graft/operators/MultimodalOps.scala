package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: images/audio/video ride through the
  * engine as opaque `binary` payloads with typed metadata columns;
  * decode / feature-extract / resize / frame-sample run as batched
  * per-partition transforms.
  *
  * The codec step is REAL for the two dependency-free raster formats:
  * [[ImageDecoder]] parses uncompressed 24-bpp BMP
  * (BITMAPINFOHEADER, bottom-up or top-down, 4-byte row padding) and
  * binary PPM (P6, comment-tolerant header, maxval-scaled), emitting a
  * fixed 16-dim feature of shape + pixel statistics (dims, channel
  * means/stds, luma range, gradient energy). Payloads in any other
  * format fall back to a deterministic 16-bin byte histogram — the
  * honest "unknown codec" path. Everything around the codec — the
  * payload schema, the partition batching shape (decoder libraries
  * amortize per-batch setup), the fixed-dim feature contract, and the
  * frame sampling — is the same production plumbing: add a JNI/codec
  * dispatch case for JPEG/PNG/audio and nothing else changes.
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

  /** Decoded raster: interleaved RGB bytes scaled to 0-255. */
  private[operators] final case class Raster(
      format: Int, width: Int, height: Int, rgb: Array[Int])

  /** Dependency-free image decoder: BMP (24-bpp uncompressed) and
    * binary PPM (P6). Returns None for anything else.
    */
  object ImageDecoder {

    val FMT_BMP = 1
    val FMT_PPM = 2

    private def i32le(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

    private def u16le(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

    /** 24-bpp uncompressed BMP with a BITMAPINFOHEADER (or larger):
      * pixel rows are BGR, padded to 4 bytes, bottom-up unless the
      * height field is negative (top-down).
      */
    private def decodeBmp(b: Array[Byte]): Option[Raster] = {
      if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
      val dataOff = i32le(b, 10)
      val hdrSize = i32le(b, 14)
      val w = i32le(b, 18)
      val hRaw = i32le(b, 22)
      val bpp = u16le(b, 28)
      val compression = i32le(b, 30)
      val h = math.abs(hRaw)
      if (hdrSize < 40 || bpp != 24 || compression != 0 ||
        w <= 0 || h == 0) return None
      val stride = ((w * 3 + 3) / 4) * 4
      if (dataOff < 0 || dataOff.toLong + stride.toLong * h > b.length)
        return None
      val rgb = new Array[Int](w * h * 3)
      var y = 0
      while (y < h) {
        // bottom-up storage: image row y lives at file row (h-1-y)
        val fileRow = if (hRaw > 0) h - 1 - y else y
        var x = 0
        val ro = dataOff + fileRow * stride
        while (x < w) {
          val po = ro + x * 3
          val oo = (y * w + x) * 3
          rgb(oo) = b(po + 2) & 0xff     // R (file order is BGR)
          rgb(oo + 1) = b(po + 1) & 0xff // G
          rgb(oo + 2) = b(po) & 0xff     // B
          x += 1
        }
        y += 1
      }
      Some(Raster(FMT_BMP, w, h, rgb))
    }

    /** Binary PPM (P6): ASCII header of `P6 <w> <h> <maxval>` with
      * `#` comments and arbitrary whitespace, one whitespace byte,
      * then w*h interleaved RGB samples (maxval <= 255 → 1 byte each),
      * rescaled to 0-255.
      */
    private def decodePpm(b: Array[Byte]): Option[Raster] = {
      if (b.length < 2 || b(0) != 'P' || b(1) != '6') return None
      var pos = 2
      def nextInt(): Option[Int] = {
        // skip whitespace and # comments
        var inComment = false
        while (pos < b.length && {
          val c = b(pos).toChar
          if (inComment) { if (c == '\n') inComment = false; true }
          else if (c == '#') { inComment = true; true }
          else c == ' ' || c == '\t' || c == '\n' || c == '\r'
        }) pos += 1
        val start = pos
        while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') pos += 1
        if (pos == start) None
        else Some(new String(b, start, pos - start, "US-ASCII").toInt)
      }
      for {
        w <- nextInt(); h <- nextInt(); maxv <- nextInt()
        if w > 0 && h > 0 && maxv > 0 && maxv <= 255 &&
          pos + 1 + 3L * w * h <= b.length
      } yield {
        pos += 1 // single whitespace after maxval
        val rgb = new Array[Int](w * h * 3)
        var i = 0
        while (i < rgb.length) {
          rgb(i) = (b(pos + i) & 0xff) * 255 / maxv
          i += 1
        }
        Raster(FMT_PPM, w, h, rgb)
      }
    }

    def decode(bytes: Array[Byte]): Option[Raster] =
      decodeBmp(bytes).orElse(decodePpm(bytes))
  }

  /** Batched codec: real BMP/PPM decode → 16-dim shape+stat feature;
    * unknown formats → deterministic normalized 16-bin byte histogram.
    */
  object StubDecoder {

    private def histogram(bytes: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](FEATURE_DIM)
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xff) % FEATURE_DIM) += 1f
        i += 1
      }
      val n = math.max(1, bytes.length).toFloat
      hist.map(_ / n)
    }

    /** [format, w, h, channels, meanR, meanG, meanB, stdR, stdG, stdB,
      * lumaMin, lumaMax, aspect, lumaMean, gradEnergy, nPixels] —
      * channel values on a 0-1 scale, std population, gradient the
      * mean |Δluma| between horizontal neighbors.
      */
    private def imageFeatures(r: Raster): Array[Float] = {
      val n = r.width * r.height
      val sum = new Array[Double](3)
      val sumSq = new Array[Double](3)
      var lMin = Double.MaxValue
      var lMax = Double.MinValue
      var lSum = 0.0
      var grad = 0.0
      var i = 0
      while (i < n) {
        val o = i * 3
        var c = 0
        var luma = 0.0
        while (c < 3) {
          val v = r.rgb(o + c) / 255.0
          sum(c) += v; sumSq(c) += v * v
          c += 1
        }
        luma = (0.299 * r.rgb(o) + 0.587 * r.rgb(o + 1) +
          0.114 * r.rgb(o + 2)) / 255.0
        lSum += luma
        if (luma < lMin) lMin = luma
        if (luma > lMax) lMax = luma
        // horizontal neighbor (same row only)
        if ((i % r.width) + 1 < r.width) {
          val o2 = o + 3
          val luma2 = (0.299 * r.rgb(o2) + 0.587 * r.rgb(o2 + 1) +
            0.114 * r.rgb(o2 + 2)) / 255.0
          grad += math.abs(luma2 - luma)
        }
        i += 1
      }
      val nGrad = math.max(1, (r.width - 1) * r.height)
      val mean = sum.map(_ / n)
      val std = (0 to 2).map(c =>
        math.sqrt(math.max(0.0, sumSq(c) / n - mean(c) * mean(c))))
      Array(r.format.toFloat, r.width.toFloat, r.height.toFloat, 3f,
        mean(0).toFloat, mean(1).toFloat, mean(2).toFloat,
        std(0).toFloat, std(1).toFloat, std(2).toFloat,
        lMin.toFloat, lMax.toFloat,
        (r.width.toDouble / r.height).toFloat, (lSum / n).toFloat,
        (grad / nGrad).toFloat, n.toFloat)
    }

    def decode(batch: Seq[Array[Byte]]): Seq[Array[Float]] =
      batch.map { bytes =>
        ImageDecoder.decode(bytes) match {
          case Some(raster) => imageFeatures(raster)
          case None         => histogram(bytes)
        }
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
