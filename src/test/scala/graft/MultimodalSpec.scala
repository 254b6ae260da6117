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

  // --- real codec: hand-assembled 2x2 images, round-tripped through
  // the binary column. Pixels (top-left origin):
  //   row 0: red   (255,0,0)   green (0,255,0)
  //   row 1: blue  (0,0,255)   white (255,255,255)
  // so each channel mean is exactly 0.5 and luma spans [~0.114, 1.0].
  private def bmp2x2: Array[Byte] = {
    val stride = 8                     // ((2*3 + 3)/4)*4
    val b = new Array[Byte](54 + stride * 2)
    def i32(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    i32(2, b.length); i32(10, 54)      // file size, pixel offset
    i32(14, 40); i32(18, 2); i32(22, 2) // BITMAPINFOHEADER, w, h
    b(26) = 1; b(28) = 24              // planes, bpp (LE u16 low bytes)
    i32(30, 0)                         // BI_RGB
    // bottom-up rows, BGR: file row 0 = image row 1 (blue, white)
    val px = Seq(
      (54, Seq(255, 0, 0, 255, 255, 255)),          // blue, white
      (54 + stride, Seq(0, 0, 255, 0, 255, 0)))     // red, green
    for ((off, vals) <- px; (v, i) <- vals.zipWithIndex)
      b(off + i) = v.toByte
    b
  }

  private def ppm2x2: Array[Byte] = {
    val hdr = "P6\n# test comment\n2 2\n255\n".getBytes("US-ASCII")
    val px = Array(255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255)
      .map(_.toByte)
    hdr ++ px
  }

  test("extractFeatures decodes real BMP and PPM payloads to pixel stats") {
    val df = Seq((1L, bmp2x2), (2L, ppm2x2)).toDF("id", "payload")
    val f = MultimodalOps.extractFeatures(df, "id", "payload")
      .collect().map(m => m.id -> m.features).toMap
    for ((id, fmt) <- Seq(1L -> 1f, 2L -> 2f)) {
      val v = f(id)
      assert(v(0) == fmt)                          // format code
      assert(v(1) == 2f && v(2) == 2f && v(3) == 3f) // w, h, channels
      for (c <- 4 to 6) assert(math.abs(v(c) - 0.5f) < 1e-6,
        s"channel mean $c of id $id: ${v(c)}")
      assert(math.abs(v(10) - 0.114f) < 1e-3)      // min luma = pure blue
      assert(math.abs(v(11) - 1.0f) < 1e-6)        // max luma = white
      assert(v(12) == 1f && v(15) == 4f)           // aspect, n_pixels
    }
    // identical pixel content → identical stats across formats
    assert(f(1L).drop(1).toSeq == f(2L).drop(1).toSeq)
  }

  test("ImageDecoder: top-down BMP (negative height) and maxval-scaled " +
    "PPM decode; truncated/foreign payloads fall back to histogram") {
    // top-down: negate the height field; rows now in image order
    val td = bmp2x2.clone()
    val hNeg = -2
    td(22) = hNeg.toByte; td(23) = (hNeg >> 8).toByte
    td(24) = (hNeg >> 16).toByte; td(25) = (hNeg >> 24).toByte
    // swap the two pixel rows so the image content stays identical
    val row0 = td.slice(54, 62); val row1 = td.slice(62, 70)
    System.arraycopy(row1, 0, td, 54, 8)
    System.arraycopy(row0, 0, td, 62, 8)
    // maxval 85: samples in 0..85 scale x3 back to 0..255
    val ppm85 = "P6\n2 2\n85\n".getBytes("US-ASCII") ++
      Array(85, 0, 0, 0, 85, 0, 0, 0, 85, 85, 85, 85).map(_.toByte)
    val df = Seq((1L, bmp2x2), (2L, td), (3L, ppm85),
        (4L, bmp2x2.take(20)), (5L, "not an image".getBytes))
      .toDF("id", "payload")
    val f = MultimodalOps.extractFeatures(df, "id", "payload")
      .collect().map(m => m.id -> m.features.toSeq).toMap
    assert(f(2L) == f(1L))                    // top-down ≡ bottom-up
    assert(f(3L).drop(1) == f(1L).drop(1))    // rescaled ≡ 255-maxval
    // fallbacks are normalized histograms, not image stats
    for (id <- Seq(4L, 5L))
      assert(math.abs(f(id).sum - 1.0) < 1e-6, s"id $id not a histogram")
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
