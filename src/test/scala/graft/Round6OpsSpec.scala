package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, MetricOps}

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

  test("globalRank histogram is bounded: sub-1e-6 score noise collapses to one bucket") {
    // 1000 rows whose scores differ only at 1e-9 — quantization must
    // rank them purely by the tiebreak, as one tie group
    val df = (0 until 1000).map(i => (i.toLong, 0.5 + i * 1e-9)).toDF("id", "score")
    val ranks = MetricOps.globalRank(df, "score", "id")
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert((0 until 1000).forall(i => ranks(i.toLong) == i + 1L))
  }
}
