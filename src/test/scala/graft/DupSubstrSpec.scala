package graft

import graft.operators.DedupOps

/** Exact-substring dedup specs (q442/q443): hand-traced 5-gram spans,
  * overlap-aware interval-union coverage, and the global-first-keeper
  * excision arithmetic.
  */
class DupSubstrSpec extends SparkSpec {
  import spark.implicits._

  // doc 1/2 share the 5-gram "a b c d e" (cross-doc dup); doc 3 is too
  // short to carry any 5-gram; doc 4 repeats "m m m m m" INSIDE itself
  // (same-doc dup, overlapping positions 0 and 1 -> ONE merged span
  // covering all 6 tokens, where naive per-position coverage would
  // count 12).
  private val docs = Seq(
    (1L, "s1", "a b c d e f g"),
    (2L, "s2", "x a b c d e y"),
    (3L, "s1", "p q r"),
    (4L, "s2", "m m m m m m")).toDF("doc_id", "source", "text")

  test("dupSubstringCensus: cross-doc and same-doc duplicated 5-grams, " +
    "interval-union coverage, short docs kept with zeros") {
    val out = DedupOps.dupSubstringCensus(docs, "doc_id", "text", 5)
      .orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_spans"),
        r.getAs[Long]("longest_run"), r.getAs[Long]("dup_tokens"),
        r.getAs[Long]("dup_ppm")))
    // doc1: dup gram at pos 0 -> 1 span of 5 tokens of 7;
    //   ppm = (5*2e6 + 7) div 14 = 714286 (half-up of 5/7).
    // doc2: dup gram at pos 1 -> same arithmetic.
    // doc3: no 5-grams -> zeros.
    // doc4: positions {0,1} overlap (gap 1 <= 4) -> ONE island, run 2,
    //   coverage 1-0+5 = 6 = the whole doc -> exactly 1e6 ppm.
    assert(out.toSeq == Seq(
      (1L, 7L, 1L, 1L, 5L, 714286L),
      (2L, 7L, 1L, 1L, 5L, 714286L),
      (3L, 3L, 0L, 0L, 0L, 0L),
      (4L, 6L, 1L, 2L, 6L, 1000000L)))
  }

  test("dupSubstringExcise: global-first keeper survives, redundant " +
    "occurrences roll up per source") {
    val out = DedupOps.dupSubstringExcise(docs, "doc_id", "text",
        "source", 5)
      .orderBy("source")
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("docs_affected"),
        r.getAs[Long]("tokens_total"), r.getAs[Long]("tokens_excised"),
        r.getAs[Long]("retained_ppm")))
    // keepers: "a b c d e" -> (doc1, 0); "m m m m m" -> (doc4, 0).
    // s1 (docs 1, 3): doc1 holds the keeper -> nothing excised.
    // s2 (docs 2, 4): doc2 pos1 redundant (5 tokens), doc4 pos1
    //   redundant (5 tokens) -> 10 of 13 excised;
    //   retained = (3*2e6 + 13) div 26 = 230769 (half-up of 3/13).
    assert(out.toSeq == Seq(
      ("s1", 2L, 0L, 10L, 0L, 1000000L),
      ("s2", 2L, 2L, 13L, 10L, 230769L)))
  }

  test("dupSubstringProvenance: directed origin->copier edges, " +
    "self-copy kept as a diagonal entry") {
    val out = DedupOps.dupSubstringProvenance(docs, "doc_id", "text",
        "source", 5)
      .orderBy("src_from", "src_to")
      .collect().map(r => (r.getAs[String]("src_from"),
        r.getAs[String]("src_to"), r.getAs[Long]("n_occurrences"),
        r.getAs[Long]("n_grams")))
    // "a b c d e" originates at (doc1, s1), copied once by doc2 (s2);
    // "m m m m m" originates at (doc4, s2) and repeats INSIDE doc4 —
    // a within-source diagonal edge.
    assert(out.toSeq == Seq(
      ("s1", "s2", 1L, 1L),
      ("s2", "s2", 1L, 1L)))
  }

  test("dupSubstringLadder: shorter grams over-excise, longer ones " +
    "find nothing — the hand-traced survival curve") {
    val out = DedupOps.dupSubstringLadder(docs, "doc_id", "text")
      .orderBy("n")
      .collect().map(r => (r.getAs[Long]("n"),
        r.getAs[Long]("n_dup_grams"), r.getAs[Long]("docs_affected"),
        r.getAs[Long]("tokens_total"), r.getAs[Long]("tokens_excised"),
        r.getAs[Long]("retained_ppm")))
    // n=3: dup grams {a b c, b c d, c d e, m m m} -> doc2 positions
    // {1,2,3} and doc4 {1,2,3} each merge to one 5-token span ->
    // 10 of 23 excised; n=5: the 2 dup grams excise the SAME 10
    // tokens; n=7/9: doc1/doc2's single 7-grams differ and nothing
    // duplicates -> full retention; n=25: no doc reaches 25 tokens,
    // so the long rung reports an empty-but-well-formed row.
    assert(out.toSeq == Seq(
      (3L, 4L, 2L, 23L, 10L, 565217L),
      (5L, 2L, 2L, 23L, 10L, 565217L),
      (7L, 0L, 0L, 23L, 0L, 1000000L),
      (9L, 0L, 0L, 23L, 0L, 1000000L),
      (25L, 0L, 0L, 23L, 0L, 1000000L)))
  }

  test("gramMultiplicitySpectrum: octave histogram of gram counts") {
    val out = DedupOps.gramMultiplicitySpectrum(docs, "doc_id", "text", 5)
      .orderBy("octave")
      .collect().map(r => (r.getAs[Int]("octave"),
        r.getAs[Long]("n_grams"), r.getAs[Long]("n_occurrences"),
        r.getAs[Long]("max_count")))
    // 6 distinct 5-grams: 4 unique (octave 0) + 2 seen twice
    // (octave 1: "a b c d e" cross-doc, "m m m m m" within-doc)
    assert(out.toSeq == Seq(
      (0, 4L, 4L, 1L),
      (1, 2L, 4L, 2L)))
  }
}
