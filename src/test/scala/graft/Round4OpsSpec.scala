package graft

import org.apache.spark.sql.functions._

import graft.operators.{EncodeOps, LayoutOps, RetrievalOps, SketchOps, TextOps}

/** Round-4 operators: winnowing fingerprints, RRF fusion, target
  * encoding, Z-order layout keys, and the KMV distinct sketch.
  */
class Round4OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ winnow

  test("winnow: docs sharing a long verbatim span share a fingerprint") {
    // k=3, w=4 → any shared run of k+w-1 = 6 tokens forces a shared
    // fingerprint (the guarantee winnowing is chosen for).
    val span = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two three $span x y z"),
      (2L, s"$span p q r s t u v w"),
      (3L, "totally different words with no overlap at all here ok"))
      .toDF("doc_id", "text")
    val fps = TextOps.winnow(docs, "doc_id", "text")
      .select($"doc_id", split($"fingerprints", ",").as("fps"))
      .as[(Long, Seq[String])].collect().toMap
    assert((fps(1L).toSet intersect fps(2L).toSet).nonEmpty)
    assert((fps(1L).toSet intersect fps(3L).toSet).isEmpty)
  }

  test("winnow: docs shorter than k + w - 1 tokens yield no row") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e f")).toDF("doc_id", "text")
    val out = TextOps.winnow(docs, "doc_id", "text")
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("winnow: fingerprint count bounded by window count") {
    val docs = Seq((1L, (1 to 20).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    // 18 grams, 15 windows → at most 15 distinct fingerprints
    val n = TextOps.winnow(docs, "doc_id", "text")
      .select("n_fps").as[Long].head()
    assert(n >= 1 && n <= 15)
  }

  // ---------------------------------------------------------- rrfFuse

  test("rrfFuse: hand-computed fusion of two rankings") {
    val a = Seq((1L, 10L, 3.0), (1L, 11L, 2.0), (1L, 12L, 1.0))
      .toDF("g", "item", "score")          // ranks: 10→1, 11→2, 12→3
    val b = Seq((1L, 11L, 9.0), (1L, 13L, 5.0))
      .toDF("g", "item", "score")          // ranks: 11→1, 13→2
    val out = RetrievalOps.rrfFuse(a, b, "g", "item", "score", 60, 10)
      .select($"item", $"rrf").as[(Long, Double)].collect().toMap
    def r(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(10L) == r(1.0 / 61))
    assert(out(11L) == r(1.0 / 62 + 1.0 / 61))
    assert(out(12L) == r(1.0 / 63))
    assert(out(13L) == r(1.0 / 62))
  }

  test("rrfFuse: item in both channels outranks single-channel items") {
    val a = Seq((1L, 10L, 5.0), (1L, 11L, 4.0)).toDF("g", "item", "score")
    val b = Seq((1L, 11L, 5.0), (1L, 12L, 4.0)).toDF("g", "item", "score")
    val top = RetrievalOps.rrfFuse(a, b, "g", "item", "score", 60, 1)
      .select("item").as[Long].head()
    assert(top == 11L)
  }

  // ------------------------------------------------------ targetEncode

  test("targetEncode: shrinkage lands between category mean and prior") {
    val df = (Seq.fill(80)(("big", 1)) ++ Seq.fill(20)(("big", 0)) ++
      Seq.fill(2)(("rare", 1))).toDF("cat", "label")
    val out = EncodeOps.targetEncode(df, "cat", "label", 20.0)
      .select($"cat", $"enc").as[(String, Double)].collect().toMap
    val prior = math.rint(82.0 / 102.0 * 1e6) / 1e6
    // big: strong evidence dominates; rare: shrinks close to the prior
    assert(math.abs(out("big") - (80 + 20 * prior) / 120.0) < 1e-6)
    assert(math.abs(out("rare") - (2 + 20 * prior) / 22.0) < 1e-6)
    // shrinkage lands strictly between category mean and prior:
    // rare (mean 1.0, n=2) collapses near the prior; big (mean 0.8,
    // n=100, just below the 0.8039 prior) moves only slightly up
    assert(out("rare") > prior && out("rare") < 1.0)
    assert(out("big") > 0.8 && out("big") < prior)
  }

  // ----------------------------------------------------------- zorder

  test("zValue: bit interleave matches a reference implementation") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (1023L, 511L))
    val out = pairs.toDF("x", "y")
      .select(LayoutOps.zValue($"x", $"y", 10).as("z"))
      .as[Long].collect().toSeq
    assert(out == pairs.map { case (x, y) => ref(x, y, 10) })
  }

  test("zOrderStats: buckets of z-sorted data span narrow boxes") {
    val df = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val stats = LayoutOps.zOrderStats(df, "x", "y", 6, 6)
      .select($"n", $"x_max" - $"x_min", $"y_max" - $"y_min")
      .as[(Long, Long, Long)].collect()
    // 4096 points, shift 6 → 64 buckets of 64 points; each bucket is an
    // 8×8 Morton tile, so each dimension spans at most 7
    assert(stats.length == 64)
    assert(stats.forall { case (n, dx, dy) => n == 64 && dx <= 7 && dy <= 7 })
  }

  // ------------------------------------------------------ kmvDistinct

  test("kmvDistinct: estimate within 3 standard errors; exact below k") {
    val df = ((1 to 5000).map(i => ("big", s"u$i")) ++
      (1 to 40).map(i => ("small", s"v$i"))).toDF("g", "v")
    val out = SketchOps.kmvDistinct(df, "g", "v", 64)
      .select($"g", $"exact_distinct", $"kmv_est", $"rel_err")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, exactBig, estBig, errBig) = out("big")
    assert(exactBig == 5000L)
    assert(errBig < 3.0 / math.sqrt(62))   // ~38% at 3σ, k=64
    assert(math.abs(math.abs(estBig - 5000.0) / 5000.0 - errBig) < 1e-4)
    val (_, exactSmall, estSmall, errSmall) = out("small")
    assert(exactSmall == 40L && estSmall == 40.0 && errSmall == 0.0)
  }

  test("kmvDistinct: estimate is invariant under repartitioning") {
    val df = (1 to 2000).map(i => ("g", s"u$i")).toDF("g", "v")
    val e1 = SketchOps.kmvDistinct(df.repartition(1), "g", "v", 64)
      .select("kmv_est").as[Double].head()
    val e7 = SketchOps.kmvDistinct(df.repartition(7), "g", "v", 64)
      .select("kmv_est").as[Double].head()
    assert(e1 == e7)
  }
}
