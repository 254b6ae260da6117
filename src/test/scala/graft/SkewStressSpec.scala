package graft

import graft.operators.{DedupOps, JoinOps, MetricOps}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Hot-key stress for the operators whose 100 TB story is "skew can't
  * hurt this shape": results must stay EXACT under a 95%-one-key
  * distribution, and the shapes that claim bounded candidate growth
  * must actually bound it (measured via shuffle-records metrics, not
  * wall clock — metrics are deterministic, timing is weather).
  */
class SkewStressSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  import spark.implicits._

  private def shuffleRecords(df: org.apache.spark.sql.DataFrame): Long = {
    df.count()
    collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: ShuffleExchangeLike => s
    }.map { s =>
      s.metrics.get("shuffleRecordsWritten").orElse(s.metrics.get("numOutputRows"))
        .map(_.value).getOrElse(0L)
    }.sum
  }

  test("saltedCountSum is exact when 95% of rows share one key") {
    val n = 20000
    val rows = (0 until n).map { i =>
      val k = if (i % 20 == 0) i.toLong % 7 else 42L   // 95% on key 42
      (k, (i % 100).toLong)
    }
    val df = rows.toDF("k", "v")
    val salted = MetricOps.saltedCountSum(df, "k", "v", 16)
      .select(col("k"), col("cnt"), col("sum").cast("long").as("sum"))
      .as[(Long, Long, Long)].collect()
      .map { case (k, c, s) => k -> ((c, s)) }.toMap
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").cast("long").as("sum"))
      .as[(Long, Long, Long)].collect()
    assert(plain.nonEmpty)
    plain.foreach { case (k, c, s) =>
      assert(salted(k) == ((c, s)), s"key $k diverged under salting")
    }
  }

  test("saltedJoin replicates the small side and matches the plain join under a hot key") {
    val hot = (0 until 5000).map(i => (1L, i.toLong)) ++
      (0 until 500).map(i => (i.toLong % 50 + 2, i.toLong))
    val large = hot.toDF("k", "payload")
    val small = (1L to 60L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val got = MetricOps.saltedJoin(large, small, "k",
        pmod(hash(col("payload")), lit(8)), 8)
      .groupBy("k").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val want = large.join(small, "k").groupBy("k")
      .agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
    assert(got == want, "salted join must be row-for-row the plain join")
  }

  test("intervalOverlapJoin stays exact when one key owns nearly all intervals") {
    val rows = (0 until 400).map { i =>
      val key = if (i < 380) 7L else i.toLong   // hot user
      (key, i.toLong, (i % 37) * 10L, (i % 37) * 10L + 25L)
    }
    val iv = rows.toDF("k", "id", "lo", "hi")
    val got = JoinOps.intervalOverlapJoin(iv, "k", "id", "lo", "hi",
        binWidth = 50L)
      .select("k", "id_a", "id_b").as[(Long, Long, Long)].collect().toSet
    val brute = rows.flatMap { case (ka, ia, la, ha) =>
      rows.collect { case (kb, ib, lb, hb)
        if ka == kb && ia < ib && la <= hb && lb <= ha => (ka, ia, ib) }
    }.toSet
    assert(got == brute, s"got ${got.size} pairs, brute ${brute.size}")
  }

  test("containmentJoin's prefix filter bounds candidates on a boilerplate-shingle corpus") {
    // Every doc shares an identical 6-token boilerplate prefix (one hot
    // shingle bucket); distinct tails keep true containment rare. A raw
    // inverted-index self-join would emit >= n^2/2 candidate rows on
    // the hot shingles alone; the rarest-first prefix filter must keep
    // total shuffle traffic well under that.
    val n = 200
    val docs = (0 until n).map { i =>
      val boiler = "terms of service apply to everyone"
      val tail = (0 until 8).map(j => s"tok${i}_$j").mkString(" ")
      (i.toLong, s"$boiler $tail")
    }.toDF("doc_id", "text")
    val cj = DedupOps.containmentJoin(docs, "doc_id", "text", 0.8)
    val out = cj.count()
    assert(out == 0, "distinct tails must not contain each other")
    val records = shuffleRecords(cj)
    // n^2/2 = 20_000 candidate pairs just from one hot shingle; the
    // prefix-filtered plan's TOTAL shuffle records (shingles + freqs +
    // prefix rows + verify) must stay an order of magnitude below it.
    assert(records < n.toLong * n / 10,
      s"shuffle records $records suggest the hot-shingle f² blowup is back")
  }

  test("dupSpanStats stays linear on a boilerplate corpus (no pair blowup)") {
    import graft.operators.TextOps
    // 95% of docs share one boilerplate sentence: its 5-grams are hot
    // keys shared by ~all docs. The op must (a) stay correct — full
    // boilerplate span flagged in every sharing doc, unique tails
    // untouched — and (b) move O(docs · grams) shuffle rows, never a
    // doc-pair stream (which would be ~n²).
    val n = 200
    val boiler = "terms of service apply to everyone here"  // 7 tokens
    val docs = (0 until n).map { i =>
      val tail = (0 until 6).map(j => s"tok${i}_$j").mkString(" ")
      if (i < 190) (i.toLong, s"$boiler $tail") else
        (i.toLong, s"unique${i} " + (0 until 13).map(j => s"u${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val out = TextOps.dupSpanStats(docs, "doc_id", "text", 5)
    val rows = out.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (i <- 0 until 190)
      // boilerplate 5-grams start at 1..3 → positions 1..7 covered; the
      // tail is unique per doc so nothing else flags
      assert(rows(i.toLong) == ((13L, 7L)), s"doc $i")
    for (i <- 190 until n)
      assert(rows(i.toLong)._2 == 0L, s"unique doc $i")
    val records = shuffleRecords(out)
    // grams ≈ 200 docs × 10 starts = 2k; a doc-pair formulation would
    // shuffle ≥ 190²/2 ≈ 18k pair rows from the hot grams alone.
    assert(records < 15000L,
      s"shuffle records $records suggest a pairwise blowup")
  }
}
