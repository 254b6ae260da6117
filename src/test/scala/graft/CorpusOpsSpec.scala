package graft

import graft.operators.{DedupOps, MixtureOps, TextOps}

/** Corpus-curation additions: PII redaction, repetition signals,
  * chunk-level dedup, and data-mixture sampling.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("redact: rules apply in order and count their own matches") {
    val df = Seq(
      (1L, "mail me at a.b@example.com or call 555-123-4567 ref 123456789"),
      (2L, "nothing sensitive here")).toDF("id", "text")
    val out = TextOps.redact(df, "id", "text", TextOps.piiRules)
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L)._1 == "mail me at <EMAIL> or call <PHONE> ref <NUM>")
    assert(out(1L)._2 == 3L)
    assert(out(2L) == ("nothing sensitive here", 0L))
  }

  test("redact: digit-run rule does not re-count the phone already replaced") {
    val df = Seq((1L, "call 555-123-4567")).toDF("id", "text")
    val out = TextOps.redact(df, "id", "text", TextOps.piiRules)
      .as[(Long, String, Long)].collect().head
    assert(out._2 == "call <PHONE>" && out._3 == 1L)
  }

  test("repetitionStats: repeated text flags junk, diverse text does not") {
    val df = Seq(
      (1L, Seq.fill(30)("spam").mkString(" ")),
      (2L, (1 to 30).map(i => s"w$i").mkString(" "))).toDF("id", "text")
    val out = TextOps.repetitionStats(df, "id", "text")
      .as[(Long, Long, Double, Double, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._3 == 1.0 && out(1L)._4 > 0.9 && out(1L)._5 == 1)
    assert(out(2L)._3 < 0.12 && out(2L)._4 == 0.0 && out(2L)._5 == 0)
  }

  test("chunkDedup: globally-first chunk occurrence wins, text reassembles") {
    val a = (1 to 4).map(i => s"a$i").mkString(" ")   // chunk A
    val b = (1 to 4).map(i => s"b$i").mkString(" ")   // chunk B
    val df = Seq((1L, s"$a $b"), (2L, s"$b $a"), (3L, a))
      .toDF("id", "text")
    val out = DedupOps.chunkDedup(df, "id", "text", 4)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // doc 1 owns both chunks; docs 2 and 3 lose all of theirs.
    assert(out(1L) == ((1L, 2L, 2L, s"$a $b")))
    assert(!out.contains(2L) && !out.contains(3L))
  }

  test("chunkDedup: within-doc repeated chunk keeps only the first") {
    val a = (1 to 3).map(i => s"a$i").mkString(" ")
    val df = Seq((1L, s"$a $a")).toDF("id", "text")
    val out = DedupOps.chunkDedup(df, "id", "text", 3)
      .as[(Long, Long, Long, String)].collect().head
    assert(out == ((1L, 2L, 1L, a)))
  }

  test("quantileGate: each group prunes against its own threshold") {
    val df = Seq(
      ("a", 1L, 0.1), ("a", 2L, 0.2), ("a", 3L, 0.3), ("a", 4L, 0.4),
      ("b", 5L, 0.9), ("b", 6L, 0.95)).toDF("source", "id", "score")
    val out = MixtureOps.quantileGate(df, "source", "id", "score", 0.5)
      .as[(String, Long, Double, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // group a: median 0.25 → keeps ids 3,4; group b: median 0.925 → id 6.
    // a's kept scores would ALL fail b's bar — per-group gating matters.
    assert(out("a") == (("a", 4L, 0.25, 2L, 7L)))
    assert(out("b") == (("b", 2L, 0.925, 1L, 6L)))
  }

  test("mixtureSample: binding source gets rate 1.0, others scale down") {
    val df = (0 until 100).map(i =>
      (i.toLong, if (i < 20) "a" else "b")).toDF("id", "source")
    val out = MixtureOps.mixtureSample(df, "source", "id",
        Map("a" -> 0.5, "b" -> 0.5))
      .as[(String, Long, Double, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // a binds: T = min(20/0.5, 80/0.5) = 40 → rate_a = 1, rate_b = 0.25.
    assert(out("a")._3 == 1.0 && out("a")._4 == 20L)
    assert(out("b")._3 == 0.25 && out("b")._4 > 0 && out("b")._4 < 80L)
    // checksum covers exactly the kept rows (a keeps everything).
    assert(out("a")._5 == (0 until 20).sum.toLong)
  }
}
