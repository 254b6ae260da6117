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

  // --- declared image family machinery (q454/q455): the synthesized
  // payloads must DECODE back to the md5 closed form the oracle
  // computes — this is the round-trip (serializer + real codec) the
  // declared gate rides on, checked here against an INDEPENDENT
  // in-test reimplementation of the pixel math.

  /** Independent pixel reference: first three md5 bytes of
    * "<seed>_<i>", optional inversion, optional PPM store+rescale.
    */
  private def refPixel(seed: Long, pseed: Long, noise: Int, w: Int,
                       x: Int, y: Int, maxv: Int, ppm: Boolean): (Int, Int, Int) = {
    val i = y * w + x
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${seed}_$i".getBytes("US-ASCII"))
    var (r, g, b) = (d(0) & 0xff, d(1) & 0xff, d(2) & 0xff)
    if (noise > 0 && (pseed + 31L * i) % 64 < noise) {
      r = 255 - r; g = 255 - g; b = 255 - b
    }
    if (ppm) (r % (maxv + 1) * 255 / maxv, g % (maxv + 1) * 255 / maxv,
      b % (maxv + 1) * 255 / maxv)
    else (r, g, b)
  }

  private def specs = Seq(
    // padded stride (w=5), bottom-up BMP
    MultimodalOps.SynthImageRow(1L, 123L, 0L, 0, 1, 5, 4, 255, topdown = false),
    // top-down BMP, square
    MultimodalOps.SynthImageRow(2L, 9876L, 0L, 0, 1, 4, 6, 255, topdown = true),
    // PPM identity maxval
    MultimodalOps.SynthImageRow(3L, 55L, 0L, 0, 2, 7, 5, 255, topdown = false),
    // PPM maxval-63 rescale + perturbation
    MultimodalOps.SynthImageRow(4L, 7L, 42L, 5, 2, 8, 8, 63, topdown = false))

  test("synthesizeImages -> decodeStats round-trips the md5 closed form " +
    "through real BMP/PPM bytes (both row orders, padding, rescale)") {
    val out = MultimodalOps.decodeStats(
        MultimodalOps.synthesizeImages(specs.toDS()), batchSize = 2)
      .collect().map(s => s.id -> s).toMap
    for (sp <- specs) {
      val px = for (y <- 0 until sp.h; x <- 0 until sp.w)
        yield (x, y, refPixel(sp.seed, sp.pseed, sp.noise, sp.w, x, y,
          sp.maxv, sp.fmt == 2))
      val st = out(sp.id)
      assert((st.fmt, st.w, st.h, st.n_px) ==
        ((sp.fmt, sp.w, sp.h, (sp.w * sp.h).toLong)), s"id ${sp.id} shape")
      assert(st.sum_r == px.map(_._3._1.toLong).sum, s"id ${sp.id} sum_r")
      assert(st.sum_g == px.map(_._3._2.toLong).sum, s"id ${sp.id} sum_g")
      assert(st.sum_b == px.map(_._3._3.toLong).sum, s"id ${sp.id} sum_b")
      def luma(p: (Int, Int, Int)) = 299L * p._1 + 587L * p._2 + 114L * p._3
      assert(st.luma1k == px.map(p => luma(p._3)).sum, s"id ${sp.id} luma")
      // the orientation canaries: x- and y-weighted sums see row order
      assert(st.luma1k_xw == px.map(p => (p._1 + 1) * luma(p._3)).sum,
        s"id ${sp.id} xw")
      assert(st.luma1k_yw == px.map(p => (p._2 + 1) * luma(p._3)).sum,
        s"id ${sp.id} yw")
    }
  }

  test("decodeAHash: unperturbed siblings hash identically, bounded " +
    "noise stays near, a different seed lands far") {
    def spec(id: Long, seed: Long, pseed: Long, noise: Int) =
      MultimodalOps.SynthImageRow(id, seed, pseed, noise, 1, 8, 8, 255,
        topdown = false)
    val hs = MultimodalOps.decodeAHash(MultimodalOps.synthesizeImages(Seq(
        spec(1L, 777L, 0L, 0), spec(2L, 777L, 1L, 0),
        spec(3L, 777L, 31337L, 4), spec(4L, 778L, 0L, 0)).toDS()))
      .collect().map(h => h.id -> ((h.h_lo, h.h_hi))).toMap
    def ham(a: (Long, Long), b: (Long, Long)) =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    assert(hs(1L) == hs(2L), "noise 0 must ignore pseed entirely")
    // halves are 32-bit: the sign bit never engages in either engine
    hs.values.foreach { case (lo, hi) =>
      assert(lo >= 0L && lo < (1L << 32) && hi >= 0L && hi < (1L << 32))
    }
    val near = ham(hs(1L), hs(3L))
    assert(near > 0 && near <= 8,
      s"noise-4 sibling should be a near-dup, hamming $near")
    assert(ham(hs(1L), hs(4L)) > 8,
      s"different seed should be far, hamming ${ham(hs(1L), hs(4L))}")
  }

  test("synthesizeWavs -> decodeAudioStats round-trips the md5 sample " +
    "closed form through real RIFF bytes (chunk walk, padding, s16 LE)") {
    val specs = Seq(
      // mono 8k, no extra chunk
      MultimodalOps.SynthAudioRow(1L, 321L, 1, 8000, 48, extraChunk = false),
      // stereo 16k with the odd-size LIST chunk (walk + pad byte)
      MultimodalOps.SynthAudioRow(2L, 99L, 2, 16000, 50, extraChunk = true))
    val out = MultimodalOps.decodeAudioStats(
        MultimodalOps.synthesizeWavs(specs.toDS()), batchSize = 1)
      .collect().map(s => s.id -> s).toMap
    for (sp <- specs) {
      val n = sp.nFrames * sp.channels
      // independent sample reference: first 16 md5 bits − 32768
      val vs = (0 until n).map { i =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"${sp.aseed}_$i".getBytes("US-ASCII"))
        (((d(0) & 0xff) << 8) | (d(1) & 0xff)) - 32768
      }
      val st = out(sp.id)
      assert((st.channels, st.sample_rate, st.n_samples) ==
        ((sp.channels, sp.sampleRate, n.toLong)), s"id ${sp.id} header")
      assert(st.sum_abs == vs.map(v => math.abs(v).toLong).sum)
      assert(st.max_abs == vs.map(v => math.abs(v).toLong).max)
      assert(st.energy == vs.map(v => v.toLong * v).sum)
      assert(st.zero_crossings == vs.sliding(2).count(p =>
        p.length == 2 && p(0).toLong * p(1) < 0))
    }
  }

  test("AudioDecoder rejects foreign/truncated payloads and non-PCM fmt") {
    val good = MultimodalOps.writeWav(
      MultimodalOps.SynthAudioRow(1L, 5L, 1, 8000, 48, extraChunk = false))
    assert(MultimodalOps.AudioDecoder.decode(good).isDefined)
    assert(MultimodalOps.AudioDecoder.decode("RIFFnope".getBytes).isEmpty)
    assert(MultimodalOps.AudioDecoder.decode(good.take(30)).isEmpty)
    val nonPcm = good.clone()
    nonPcm(20) = 3 // IEEE float format tag -> fmtOk must fail
    assert(MultimodalOps.AudioDecoder.decode(nonPcm).isEmpty)
    // corrupt a chunk size so it overruns the buffer -> clean None
    val overrun = good.clone()
    overrun(16) = 127 // fmt chunk claims 127 bytes
    assert(MultimodalOps.AudioDecoder.decode(overrun).isEmpty)
  }

  test("imagePhashNearDup: sibling pairs surface through the band join, " +
    "batch independence holds, and no cross-seed pair appears") {
    // 48 docs, docsPerCluster 16 -> 3 clusters of 16 siblings each
    val docs = (0L until 48L).toDF("doc_id")
    val out = MultimodalOps.imagePhashNearDup(docs, "doc_id",
        docsPerCluster = 16, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.nonEmpty, "sibling near-dups must surface")
    // cluster = id % 3 here: every reported pair must be same-cluster
    // (the md5 pixels keep distinct-seed hashes ~32 bits apart)
    assert(out.forall { case (a, b, _) => a % 3 == b % 3 },
      "no cross-cluster pair may pass the hamming verify")
    assert(out.forall { case (a, b, h) => a < b && h >= 0 && h <= 6 })
    // the zero-noise siblings of each cluster (id/3 % 9 == 0: sibling
    // indices 0 and 9 -> ids c, c+27 etc.) hash identically -> hamming 0
    assert(out.exists(_._3 == 0))
  }
}
