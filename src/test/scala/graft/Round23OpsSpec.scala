package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, MixtureOps, SimilarityOps, TextOps}

/** Round-23 specs: boundary-hash prefix/continuation links, the
  * Heaps'-law OLS chain on hand moments, self-repetition ppm, the
  * truncation-loss sweep arithmetic, isotropy's centroid identity on
  * exact geometric fixtures, and the interleave audit's two extremes.
  */
class Round23OpsSpec extends SparkSpec {
  import spark.implicits._

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r12(v: Double): Double =
    BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("prefixSuffixDup: prefix families, continuation links, and " +
    "short-doc zero-fill") {
    val df = Seq(
      (1L, "a b c"), // prefix "a b" (family with d2), suffix "b c" -> d3
      (2L, "a b d"), // prefix "a b", suffix "b d" (no link)
      (3L, "b c x"), // prefix "b c" <- continuation of d1
      (4L, "z")      // shorter than k: all zeros
    ).toDF("doc_id", "text")
    val out = DedupOps.prefixSuffixDup(df, "doc_id", "text", 2)
      .orderBy("doc_id").collect()
    // (prefix_group_size, shares_prefix, cont_out, cont_in)
    val exp = Seq((2L, 1L, 1L, 0L), (2L, 1L, 0L, 0L),
      (1L, 0L, 0L, 1L), (0L, 0L, 0L, 0L))
    for ((row, e) <- out.zip(exp)) {
      assert((row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4)) == e, s"doc ${row.getLong(0)}")
    }
  }

  test("heapsLaw: OLS on hand moments matches, degenerate source " +
    "yields nulls") {
    val df = Seq(
      (1L, "a b", "A"),                 // n=2 v=2
      (2L, "a a b c", "A"),             // n=4 v=3
      (3L, "a b c d e f a b", "A"),     // n=8 v=6
      (4L, "x y", "B"), (5L, "y z", "B") // same length: dx = 0
    ).toDF("doc_id", "text", "source")
    val out = TextOps.heapsLaw(df, "source", "text")
      .orderBy("source").collect()
    val xs = Seq(2.0, 4.0, 8.0).map(n => r12(math.log(n)))
    val ys = Seq(2.0, 3.0, 6.0).map(v => r12(math.log(v)))
    val n = 3.0
    val sx = xs.sum; val sy = ys.sum
    val sxy = xs.zip(ys).map { case (x, y) => r12(x * y) }.sum
    val sxx = xs.map(x => r12(x * x)).sum
    val syy = ys.map(y => r12(y * y)).sum
    val dx = n * sxx - sx * sx; val dy = n * syy - sy * sy
    val cv = n * sxy - sx * sy
    assert(out(0).getAs[Double]("beta") == r6(cv / dx))
    assert(out(0).getAs[Double]("r2") == r6(cv * cv / (dx * dy)))
    assert(out(0).getAs[Double]("growth_10x") ==
      r6(math.pow(10.0, cv / dx)))
    assert(out(1).isNullAt(out(1).fieldIndex("beta")) &&
      out(1).isNullAt(out(1).fieldIndex("growth_10x")))
  }

  test("selfRepetition: shared trigram occurrences count once per " +
    "occurrence, sources do not mix") {
    val df = Seq(
      (1L, "a b c d", "A"), // trigrams: "a b c", "b c d"
      (2L, "a b c x", "A"), // trigrams: "a b c", "b c x"
      (3L, "a b c d", "B")  // same text, other source: no sharing
    ).toDF("doc_id", "text", "source")
    val out = TextOps.selfRepetition(df, "source", "doc_id", "text")
      .orderBy("source").collect()
    // A: 4 occurrences, 3 distinct, "a b c" spans 2 docs -> rep=2
    assert(out(0).getAs[Long]("n_trigram_occ") == 4L)
    assert(out(0).getAs[Long]("n_distinct_trigrams") == 3L)
    assert(out(0).getAs[Long]("selfrep_ppm") == 500000L)
    // B: 2 occurrences, both doc-local
    assert(out(1).getAs[Long]("n_trigram_occ") == 2L)
    assert(out(1).getAs[Long]("selfrep_ppm") == 0L)
  }

  test("truncationLoss: exact kept/lost split and half-up ppm") {
    val df = Seq.tabulate(10)(i => Tuple1(("w " * 10).trim)) // 10 tokens
      .toDF("text")
      .union(Seq(Tuple1(("w " * 300).trim)).toDF("text")) // 300 tokens
    val out = TextOps.truncationLoss(df, "text", Seq(16, 256))
      .orderBy("cap").collect()
    // cap 16: 10 docs keep 10 each, the long doc keeps 16, loses 284
    assert(out(0).getAs[Long]("docs_truncated") == 1L)
    assert(out(0).getAs[Long]("tokens_kept") == 116L)
    assert(out(0).getAs[Long]("tokens_lost") == 284L)
    // ppm = round(284e6 / 400) half-up = 710000
    assert(out(0).getAs[Long]("loss_ppm") == 710000L)
    // cap 256: only the long doc truncated, loses 44
    assert(out(1).getAs[Long]("tokens_lost") == 44L)
    assert(out(1).getAs[Long]("loss_ppm") ==
      ((44L * 2000000L + 400L) / 800L))
  }

  test("isotropyAudit: centroid identity reproduces exact pairwise " +
    "cosines (parallel / orthogonal / antipodal)") {
    val df = Seq(
      (1L, Array(1f, 0f), 0),  // parallel pair: mean cos 1
      (2L, Array(1f, 0f), 0),
      (3L, Array(1f, 0f), 1),  // orthogonal pair: mean cos 0
      (4L, Array(0f, 1f), 1),
      (5L, Array(3f, 4f), 2),  // antipodal pair: mean cos -1
      (6L, Array(-3f, -4f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.isotropyAudit(df, "embedding", "label")
      .orderBy("label").collect()
    assert(out(0).getAs[Double]("mean_pairwise_cos") == 1.0)
    assert(out(1).getAs[Double]("mean_pairwise_cos") == 0.0)
    assert(out(2).getAs[Double]("mean_pairwise_cos") == -1.0)
    assert(out(2).getAs[Double]("mean_norm") == 5.0)
    assert(out(0).getAs[Long]("n_vecs") == 2L)
  }

  test("interleaveAudit: one-source shard is a single run; " +
    "all-distinct sources hit the expected-runs ceiling") {
    val mono = Seq.tabulate(20)(i => (i.toLong, "only"))
      .toDF("doc_id", "source")
    val m = MixtureOps.interleaveAudit(mono, "doc_id", "source", 1)
      .collect()
    assert(m.length == 1 && m(0).getAs[Long]("runs") == 1L &&
      m(0).getAs[Long]("max_run") == 20L &&
      m(0).getAs[Double]("expected_runs") == 1.0 &&
      m(0).getAs[Double]("interleave_ratio") == 1.0)
    val distinct = Seq.tabulate(20)(i => (i.toLong, s"s$i"))
      .toDF("doc_id", "source")
    val d = MixtureOps.interleaveAudit(distinct, "doc_id", "source", 1)
      .collect()
    // every neighbor differs: runs = n = 20, max_run = 1;
    // expected = 1 + 19 * (400 - 20) / 400 = 19.05
    assert(d(0).getAs[Long]("runs") == 20L &&
      d(0).getAs[Long]("max_run") == 1L)
    assert(d(0).getAs[Double]("expected_runs") == 19.05)
    assert(d(0).getAs[Double]("interleave_ratio") == r6(20.0 / 19.05))
  }
}
