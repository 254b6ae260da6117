package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, MixtureOps, TextOps}
import graft.tables.Tables

/** End-to-end training-corpus curation — the LLM-pipeline counterpart
  * of [[Pipeline]] (which runs the reference's recsys flow). One lazy
  * DAG from raw documents to a mixture-sampled training set:
  *
  *   1. normalize + PII-redact (one codegen scan);
  *   2. repetition + quality gates (Gopher signals; per-source
  *      quantile bar so strict sources don't starve permissive ones);
  *   3. exact dedup (keep canonical min-id doc);
  *   4. cross-doc chunk dedup (C4 line-dedup shape);
  *   5. MinHash near-dup removal (banded LSH candidates, keep min id
  *      of each candidate pair's loser set);
  *   6. mixture sampling to target source proportions.
  *
  * Each stage is a DataFrame → DataFrame function; nothing
  * materializes until the caller writes. Stage row counts are the
  * curation report a corpus job ships with.
  *
  * At 100 TB every stage keeps the properties its operator documents:
  * no all-pairs joins (LSH buckets only), broadcast-only joins against
  * per-source metas, one window over the chunk-hash key, and
  * deterministic md5 sampling that re-runs identically under any
  * partitioning.
  */
object CorpusPipeline {

  case class Result(curated: DataFrame, report: Seq[(String, Long)])

  def run(spark: SparkSession, dir: String,
          weights: Map[String, Double] = Map(
            "src0" -> 0.4, "src1" -> 0.35, "src2" -> 0.25)): Result = {
    val docs = Tables.documents(spark, dir)
    val n0 = docs.count()

    // 1. normalize + redact — both single-pass column transforms.
    val clean = TextOps.redact(docs, "doc_id", "text", TextOps.piiRules)
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("clean_text").as("text"))
    // 2a. repetition gate (absolute thresholds, rounded-before-guard).
    val unrepeated = clean.join(
      TextOps.repetitionStats(clean, "doc_id", "text")
        .filter(col("junk") === 0).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val n1 = unrepeated.count()
    // 2b. per-source quality quantile gate (drop each source's worst 10%).
    val scored = TextOps.qualityScore(unrepeated, "doc_id", "text",
        Seq("the", "a"))
      .join(unrepeated.select("doc_id", "source", "text"), Seq("doc_id"))
    val thr = scored.groupBy("source")
      .agg(round(expr("percentile(quality, 0.1)"), 6).as("__thr"))
    val gated = scored.join(broadcast(thr), Seq("source"))
      .filter(col("quality") >= col("__thr"))
      .select("doc_id", "source", "text")
    val n2 = gated.count()

    // 3. exact dedup — keep each text's min-id representative.
    val exact = gated.join(
      DedupOps.exactDedup(gated, "doc_id", "text")
        .select(col("canonical_id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    val n3 = exact.count()

    // 4. cross-doc chunk dedup: rewrite texts, drop emptied docs.
    val chunked = DedupOps.chunkDedup(exact, "doc_id", "text", 20)
      .select(col("doc_id"), col("clean_text").as("text"))
      .join(exact.select("doc_id", "source"), Seq("doc_id"))
    val n4 = chunked.count()

    // 5. near-dup removal: from every banded-LSH candidate pair, the
    // larger id loses; survivors = docs never on the losing side.
    val sh = DedupOps.shingles(chunked, "doc_id", "text")
    val losers = DedupOps.minhashCandidates(
        DedupOps.minhashSignature(sh, "doc_id", 4, 2), "doc_id", 4, 2)
      .select(col("doc_b").as("doc_id")).distinct()
    val nearDeduped = chunked.join(losers, Seq("doc_id"), "left_anti")
    val n5 = nearDeduped.count()

    // 6. mixture sampling — deterministic md5 draw to target weights.
    val rates = MixtureOps.mixtureSample(nearDeduped, "source", "doc_id",
      weights)
    val u = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    val sampled = nearDeduped
      .join(broadcast(rates.select(col("source"), col("rate"))), Seq("source"))
      .filter(u < col("rate"))
      .select("doc_id", "source", "text")
    val n6 = sampled.count()

    Result(sampled, Seq(
      "raw" -> n0, "repetition_gate" -> n1, "quality_gate" -> n2,
      "exact_dedup" -> n3, "chunk_dedup" -> n4, "near_dedup" -> n5,
      "mixture_sample" -> n6))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = run(spark, dir)
    r.report.foreach { case (stage, n) => println(f"$stage%-16s $n%8d") }
    spark.stop()
  }
}
