package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables
import graft.operators.{AsOfJoin, DedupOps, EncodeOps, ExperimentOps, GraphOps, JoinOps, LayoutOps, MetricOps, MixtureOps, MultimodalOps, QualityChecks, RelationalOps, RetrievalOps, SamplingOps, SimilarityOps, SketchOps, TextOps}

/** Driver contract (SURVEY.md §7): named deterministic queries over the
  * testdata tables, each with a DuckDB-oracle SQL twin. Query keys map to
  * SURVEY §2 operator IDs (noted per query). Determinism rules (§7.3):
  * every query ends in a total ORDER BY with a unique tiebreaker, arrays
  * are sorted, floating outputs rounded, int outputs typed BIGINT/INT
  * identically in both engines, and md5-seeded hashing replaces any
  * engine-private hash.
  */
object SparkEntry {
  private val HOLD_N = 10
  private val TEST_RATIO = 0.2
  private val CLICK_THRESHOLD = 100.0
  private val PIT_FRAME = 10

  private val SEG_CODES = Map("AUTOMOBILE" -> 1, "BUILDING" -> 2,
    "FURNITURE" -> 3, "HOUSEHOLD" -> 4, "MACHINERY" -> 5)
  private val NAME_VOCAB = Seq("widget", "bolt", "rod", "gear", "small", "large")
  private val LANG_PROFILES = Seq(
    "sql"   -> Seq("join", "filter", "group", "query", "sort", "agg"),
    "infra" -> Seq("spark", "stream", "batch", "hash", "merge", "scan"),
    "data"  -> Seq("data", "row", "column", "table", "value", "vector"))
  private val STOPWORDS = Seq("the", "a")
  private val EVENT_TYPES = Seq("click", "error", "purchase", "signup", "view")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Flagship.recommend(spark, "/root/testdata/sf0.001")

  /** Events with the implicit-feedback label (P1 analogue on testdata). */
  private def labeled(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("label", when(col("value") > CLICK_THRESHOLD, 1).otherwise(0))

  private val userOrder = Seq(col("ts"), col("event_id"))

  // ------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(
    // S3/P2/P3/O1 — scan with pushed filter + ordered projection.
    "q01_scan_filter_project" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 30 && col("l_returnflag") === "A")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")),

    // P1 — implicit label encode.
    "q02_label_encode" -> ((s, d) =>
      labeled(s, d).select("event_id", "label").orderBy("event_id")),

    // A1 — group count.
    "q03_group_count" -> ((s, d) =>
      Tables.events(s, d).groupBy("user_id").agg(count(lit(1)).as("cnt"))
        .orderBy("user_id")),

    // W1/W4/W5 — per-user row number, 3-way time split, deterministic
    // queryid (key-composed, not a global window — scale-safe).
    "q04_rownum_split" -> ((s, d) => {
      val rn = RelationalOps.rowNumber(Tables.events(s, d), "user_id", userOrder)
      RelationalOps.threeWaySplit(
          rn.withColumn("u_cnt", count(lit(1)).over(Window.partitionBy("user_id"))),
          "rn", "u_cnt", HOLD_N, TEST_RATIO)
        .select(col("event_id"), col("rn").cast("long").as("rn"), col("istest"),
          (col("user_id") * 1000000L + col("rn")).as("queryid"))
        .orderBy("event_id")
    }),

    // A2 — order-preserving collect_list. Output stringified (array_join):
    // the driver's compare cannot sort raw array cells (determinism rules).
    "q05_collect_list_ordered" -> ((s, d) =>
      RelationalOps.orderedCollectList(Tables.events(s, d), "user_id",
          "event_id", Seq("ts", "event_id"), "event_ids")
        .select(col("user_id"),
          array_join(col("event_ids").cast("array<string>"), ",").as("event_ids"))
        .orderBy("user_id")),

    // A3 — collect_set, sorted + stringified for determinism.
    "q06_collect_set" -> ((s, d) =>
      Tables.lineitem(s, d).groupBy("l_orderkey")
        .agg(array_join(sort_array(collect_set(col("l_returnflag"))), ",").as("flags"))
        .orderBy("l_orderkey")),

    // J2/J3 — 3-way left join; dims broadcast.
    "q07_left_join" -> ((s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"), "left")
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"), "left")
        .select("o_orderkey", "o_custkey", "c_name", "n_name")
        .orderBy("o_orderkey")),

    // J7 — anti-join (the seen-item filter shape: customers with no
    // high-value order).
    "q08_anti_join" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 200000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")),

    // J8 — semi-join (customers with at least one order).
    "q09_semi_join" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")),

    // W2/J4 — the crown jewel: point-in-time frame (prev ≤10 rows, strictly
    // before current) per user.
    "q10_pit_window" -> ((s, d) =>
      RelationalOps.pitWindow(labeled(s, d), "user_id", userOrder, "label", PIT_FRAME)
        .select(col("event_id"), col("pit_imp"), col("pit_clk").cast("long").as("pit_clk"))
        .orderBy("event_id")),

    // W3 — user snapshot: last ≤11 rows, evaluated at each user's last row.
    "q11_user_snapshot" -> ((s, d) =>
      RelationalOps.userSnapshot(labeled(s, d), "user_id", userOrder, "label", PIT_FRAME)
        .select(col("user_id"), col("snap_imp"), col("snap_clk").cast("long").as("snap_clk"))
        .orderBy("user_id")),

    // P6/F1 — multi-hot membership flags over tokenized p_name.
    "q12_multi_hot" -> ((s, d) =>
      RelationalOps.multiHot(
          Tables.part(s, d).withColumn("__toks", split(col("p_name"), " ")),
          col("__toks"), NAME_VOCAB, "has_")
        .select((Seq(col("p_partkey")) ++ NAME_VOCAB.map(v => col(s"has_$v"))): _*)
        .orderBy("p_partkey")),

    // P5/F8 — dict-mapping encode with default-0 fallback.
    "q13_dict_encode" -> ((s, d) =>
      RelationalOps.dictEncode(Tables.customer(s, d), "c_mktsegment", "seg_code",
          SEG_CODES)
        .select("c_custkey", "seg_code").orderBy("c_custkey")),

    // A5/F3 — z-score on train-only stats (train = returnflag <> 'R'),
    // with the reference's NaN-mean→0 / std≤0→1 guards.
    "q14_zscore" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      RelationalOps.zscore(li, li.filter(col("l_returnflag") =!= "R"),
          "l_extendedprice", "z")
        .select("l_orderkey", "l_linenumber", "z")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // P8/A7 — constant-column prune report.
    "q15_const_prune" -> ((s, d) =>
      RelationalOps.constPruneReport(Tables.lineitem(s, d),
          Seq("l_returnflag", "l_linestatus", "l_quantity", "l_tax"))
        .orderBy("col_name")),

    // O2/O3 — top-3 lineitems per order by price, deterministic tiebreak.
    "q16_topk_per_group" -> ((s, d) =>
      RelationalOps.topKPerGroup(Tables.lineitem(s, d), "l_orderkey",
          Seq(col("l_extendedprice").desc, col("l_linenumber")), 3)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")),

    // O1/O2/O3 — global top-20 with key tiebreak.
    "q17_global_topk" -> ((s, d) =>
      Tables.orders(s, d).select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(20)),

    // R3 — hybrid union retrieval: two boosted channels summed per key.
    "q18_hybrid_union" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val chanA = o.filter(col("o_orderstatus") === "O").groupBy("o_custkey")
        .agg((count(lit(1)) * 0.1).as("score"))
      val chanB = o.filter(col("o_totalprice") > 150000).groupBy("o_custkey")
        .agg((count(lit(1)) * 0.9).as("score"))
      RelationalOps.hybridUnion(Seq(chanA, chanB), Seq("o_custkey"), "score")
        .select(col("o_custkey"), round(col("score"), 4).as("score"))
        .orderBy(col("score").desc, col("o_custkey")).limit(100)
    }),

    // A5 — grouped mean/stddev_samp (ddof=1).
    "q19_mean_std_group" -> ((s, d) =>
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(avg(col("l_quantity")), 4).as("mean_qty"),
          round(stddev_samp(col("l_quantity")), 4).as("std_qty"))
        .orderBy("l_returnflag")),

    // A6 — max-based cardinality derivation (feat-meta analogue).
    "q20_max_cardinality" -> ((s, d) => {
      val feats = Seq(
        Tables.events(s, d).agg(lit("events.user_id").as("feat"),
          (max(col("user_id")) + 1).cast("long").as("cardinality")),
        Tables.customer(s, d).agg(lit("customer.c_nationkey").as("feat"),
          (max(col("c_nationkey")) + 1).cast("long").as("cardinality")),
        Tables.lineitem(s, d).agg(lit("lineitem.l_linenumber").as("feat"),
          (max(col("l_linenumber")) + 1).cast("long").as("cardinality")))
      feats.reduce(_.unionAll(_)).orderBy("feat")
    }),

    // F7 — JSON field extraction.
    "q21_json_extract" -> ((s, d) =>
      TextOps.jsonExtractLong(Tables.events(s, d), "props", "$.k", "k")
        .select("event_id", "k").orderBy("event_id")),

    // §2.9 — sessionization (30-min gap) via lag + cumulative sum.
    "q22_sessionize" -> ((s, d) =>
      TextOps.sessionize(Tables.events(s, d), "user_id", "ts", "event_id", 1800L)
        .select("event_id", "user_id", "session_id").orderBy("event_id")),

    // ops/scale — token term frequency over documents.
    "q23_token_tf" -> ((s, d) =>
      TextOps.termFrequency(Tables.documents(s, d), "text").orderBy("token")),

    // ops/scale — exact dedup: canonical id per distinct text.
    "q24_dedup_exact" -> ((s, d) =>
      DedupOps.exactDedup(Tables.documents(s, d), "doc_id", "text")
        .orderBy("canonical_id")),

    // A9 — rank-formula ROC-AUC, distributed (per-score-partition ranks
    // + broadcast score histogram — no single-partition global window).
    "q25_auc_sql" -> ((s, d) =>
      MetricOps.auc(
        labeled(s, d)
          .withColumn("score", get_json_object(col("props"), "$.k").cast("long")),
        "label", "score", "event_id")),

    // R2/F4/F5 — brute-force cosine top-5 (exact ANN baseline; LSH/IVF
    // variant in q35 is the 100 TB path).
    "q26_cosine_topk" -> ((s, d) =>
      SimilarityOps.cosineTopK(Tables.embeddings(s, d), "vec_id", "embedding", 5)
        .orderBy("vec_id", "neighbor_id")),

    // ops/scale — banded MinHash LSH near-dup candidate pairs (4 bands × 2
    // rows, md5-seeded hashes — engine-portable, never O(n²)).
    "q27_minhash_neardup" -> ((s, d) => {
      val sh = DedupOps.shingles(Tables.documents(s, d), "doc_id", "text")
      DedupOps.minhashCandidates(
          DedupOps.minhashSignature(sh, "doc_id", 4, 2), "doc_id", 4, 2)
        .orderBy("doc_a", "doc_b")
    }),

    // ops/scale — 32-bit SimHash signatures.
    "q28_simhash" -> ((s, d) =>
      DedupOps.simhash(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // ops/scale — LSH candidates + exact n-gram Jaccard verification.
    "q29_lsh_jaccard" -> ((s, d) =>
      DedupOps.lshJaccard(
          DedupOps.shingles(Tables.documents(s, d), "doc_id", "text"), "doc_id")
        .orderBy("doc_a", "doc_b")),

    // ops/scale — heuristic language ID (profile-overlap argmax).
    "q30_langid" -> ((s, d) =>
      TextOps.langId(Tables.documents(s, d), "doc_id", "text", LANG_PROFILES)
        .select("doc_id", "score_sql", "score_infra", "score_data", "lang_pred")
        .orderBy("doc_id")),

    // ops/scale — heuristic quality scoring.
    "q31_quality" -> ((s, d) =>
      TextOps.qualityScore(Tables.documents(s, d), "doc_id", "text", STOPWORDS)
        .select("doc_id", "n_tokens", "stop_ratio", "quality").orderBy("doc_id")),

    // ops/scale — per-document token statistics.
    "q32_token_stats" -> ((s, d) =>
      TextOps.tokenStats(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // ops/scale — md5 content fingerprint over normalized text.
    "q33_fingerprint" -> ((s, d) =>
      TextOps.fingerprint(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // ops/scale — corpus text normalization (lowercase, punct strip,
    // stopword removal) with removed-token metadata.
    "q47_text_normalize" -> ((s, d) =>
      TextOps.normalizeText(Tables.documents(s, d), "doc_id", "text", STOPWORDS)
        .orderBy("doc_id")),

    // (q34 exact embedding near-dup demoted to a unit fixture in
    // round 9 — DedupSimilaritySpec covers the all-pairs exact form;
    // q60 is the declared bucketed scale twin.)

    // ops/scale — IVF-bucketed ANN top-3 (sign-pattern coarse quantizer).
    "q35_ann_ivf" -> ((s, d) =>
      SimilarityOps.annTopK(Tables.embeddings(s, d), "vec_id", "embedding", 3, 4)
        .orderBy("vec_id", "neighbor_id")),

    // ops/scale — BUCKETED embedding near-dup: multi-probe sign-bucket
    // candidates + exact-cosine threshold; the 100 TB path (q34 is the
    // all-pairs exactness twin, small-scale only).
    "q60_embedding_neardup_bucketed" -> ((s, d) =>
      SimilarityOps.embeddingNearDupBucketed(Tables.embeddings(s, d), "vec_id",
          "embedding", 0.35, 4)
        .orderBy("id_a", "id_b")),

    // ops/scale — multimodal column plumbing: opaque binary payload +
    // typed metadata (byte length, content hash, stub "decoded" feature).
    "q36_multimodal_meta" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .select(col("doc_id"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          md5(col("payload")).as("content_md5"),
          ascii(substring(col("text"), 1, 1)).as("first_byte"))
        .withColumn("fake_feature", round(col("first_byte") / 255.0, 6))
        .orderBy("doc_id")),

    // S7/S8/P9/P10/F2 — serving snapshot: per-user term/filter strings
    // with per-field defaults on miss.
    "q37_serving_snapshot" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val seen = ev.groupBy("user_id").agg(count(lit(1)).as("n_seen"))
      val terms = ev.groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
        .filter(col("c") >= 3)
        .groupBy("user_id")
        .agg(array_join(sort_array(collect_list(col("event_type"))), ",").as("term_str"))
      Tables.customer(s, d).filter(col("c_custkey") < 200)
        .select(col("c_custkey").as("user_id"))
        .join(seen, Seq("user_id"), "left")
        .join(terms, Seq("user_id"), "left")
        .select(col("user_id"),
          coalesce(col("term_str"), lit("")).as("term_str"),
          coalesce(col("n_seen"), lit(0L)).as("n_seen"))
        .orderBy("user_id")
    }),

    // W2 faithful multi-term form — per-term [imp,clk] over the user's
    // previous ≤10 IMPRESSIONS (rn-RANGE frame after term explode; each
    // event carries two synthetic terms).
    "q39_pit_term_window" -> ((s, d) => {
      val ev = TextOps.jsonExtractLong(labeled(s, d), "props", "$.k", "k")
        .withColumn("terms", array(col("event_type"),
          concat(lit("k"), (col("k") % 3).cast("string"))))
      val rn = RelationalOps.rowNumber(ev, "user_id", userOrder)
      RelationalOps.pitTermWindow(rn, "user_id", "rn", "terms", "label", PIT_FRAME)
        .select(col("event_id"), col("term"), col("term_imp"),
          col("term_clk").cast("long").as("term_clk"))
        .orderBy("event_id", "term")
    }),

    // W3 multi-term snapshot + P10 threshold — serving term list from
    // the user's last ≤11 impressions, clicks ≥ 2.
    "q40_user_term_snapshot" -> ((s, d) => {
      val ev = TextOps.jsonExtractLong(labeled(s, d), "props", "$.k", "k")
        .withColumn("terms", array(col("event_type"),
          concat(lit("k"), (col("k") % 3).cast("string"))))
      val rn = RelationalOps.rowNumber(ev, "user_id", userOrder)
        .withColumn("u_cnt", count(lit(1)).over(Window.partitionBy("user_id")))
      RelationalOps.termSnapshot(rn, "user_id", "rn", "u_cnt", "terms",
          "label", PIT_FRAME, 2L)
        .select(col("user_id"), array_join(col("terms"), ",").as("terms"))
        .orderBy("user_id")
    }),

    // time-RANGE window — count/sum of the user's events in the
    // PRECEDING HOUR (exclusive of now): a temporal range frame on
    // epoch-micros, identical integer arithmetic in both engines.
    "q46_time_range_window" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600000000L, -1L)
      labeled(s, d)
        .withColumn("hour_imp", count(lit(1)).over(w))
        .withColumn("hour_clk", coalesce(sum(col("label")).over(w), lit(0L)))
        .select(col("event_id"), col("hour_imp"),
          col("hour_clk").cast("long").as("hour_clk"))
        .orderBy("event_id")
    }),

    // R1 — term recall: user term lists vs item term arrays
    // (explode+join semi form of ES `terms`), seen-item anti-filter
    // applied BEFORE top-k, boost × |overlap| scoring.
    "q44_term_recall" -> ((s, d) => {
      val ev = labeled(s, d)
      val terms = ev.groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
        .filter(col("c") >= 3).groupBy("user_id")
        .agg(sort_array(collect_set(col("event_type"))).as("terms"))
      val seen = ev.filter(col("value") > 150)
        .groupBy("user_id").agg(sort_array(collect_set(col("event_type"))).as("seen"))
      val users = terms.join(seen, Seq("user_id"), "left")
        .withColumn("seen", coalesce(col("seen"), array()))
      val items = s.range(1).select(
          explode(array(EVENT_TYPES.map(lit): _*)).as("item"))
        .withColumn("terms", array(col("item")))
      RetrievalOps.termRecall(users, items, "user_id", "terms", "seen",
          "item", "terms", 0.1, 2)
        .select(col("user_id"), col("item"), round(col("score"), 4).as("score"))
        .orderBy("user_id", "item")
    }),

    // W2 dense grid — the 36-dense-column feature contract: [imp,clk]
    // per (impression × vocab term) over the previous ≤10 impressions.
    "q45_pit_feature_grid" -> ((s, d) => {
      val ev = TextOps.jsonExtractLong(labeled(s, d), "props", "$.k", "k")
        .withColumn("terms", array(col("event_type"),
          concat(lit("k"), (col("k") % 3).cast("string"))))
      val rn = RelationalOps.rowNumber(ev, "user_id", userOrder)
      RelationalOps.pitTermFeatures(rn.filter(col("user_id") < 30), "user_id",
          "rn", "terms", "label", EVENT_TYPES ++ Seq("k0", "k1", "k2"), PIT_FRAME)
        .select(col("event_id"), col("term"),
          col("term_imp").cast("long").as("term_imp"),
          col("term_clk").cast("long").as("term_clk"))
        .orderBy("event_id", "term")
    }),

    // OLAP rollup — hierarchical totals with grouping indicators
    // (beyond the reference's surface; DECIMAL sums for cross-engine
    // exactness, group-key nulls coalesced so null-ordering differences
    // can't reorder rows).
    "q48_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        // decimal cast BELOW the rollup's Expand: once per input row,
        // not once per grouping set
        .withColumn("__qd", col("l_quantity").cast("decimal(18,2)"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(grouping(col("l_returnflag")).cast("int").as("g1"),
          grouping(col("l_linestatus")).cast("int").as("g2"),
          sum(col("__qd")).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("g1"), col("g2"), col("sum_qty"), col("n"))
        .orderBy("g1", "g2", "returnflag", "linestatus")),

    // exact linear-interpolation percentiles per group (the
    // data-quality profiling surface: median + tail).
    "q49_percentiles" -> ((s, d) =>
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.95)"), 6).as("p95"),
          round(expr("percentile(l_extendedprice, 0.99)"), 6).as("price_p99"))
        .orderBy("l_returnflag")),

    // per-group ntile quartiles (partitioned — no global total order).
    "q50_ntile" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("quartile", ntile(4).over(w))
        .groupBy("o_orderpriority", "quartile")
        .agg(count(lit(1)).as("n"),
          round(max(col("o_totalprice")), 2).as("max_price"))
        .orderBy("o_orderpriority", "quartile")
    }),

    // pivot — long-to-wide event counts per user with 0 defaults (the
    // query form of pivotTermFeatures).
    "q51_pivot" -> ((s, d) =>
      Tables.events(s, d).groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(count(lit(1)))
        .select(col("user_id") +: EVENT_TYPES.map(t =>
          coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
        .orderBy("user_id")),

    // set operations — INTERSECT / EXCEPT with distinct semantics.
    "q52_set_ops" -> ((s, d) => {
      val building = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val bigBuyers = Tables.orders(s, d).groupBy("o_custkey")
        .agg(count(lit(1)).as("n")).filter(col("n") >= 12)
        .select(col("o_custkey").as("c_custkey"))
      building.intersect(bigBuyers)
        .withColumn("which", lit("building_and_big"))
        .unionAll(building.except(bigBuyers)
          .withColumn("which", lit("building_only")))
        .select("which", "c_custkey")
        .orderBy("which", "c_custkey")
    }),

    // scalar string functions — substr/lpad/translate/levenshtein.
    "q53_string_funcs" -> ((s, d) =>
      Tables.customer(s, d).select(
          col("c_custkey"),
          substring(col("c_name"), 1, 8).as("prefix"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
          translate(col("c_mktsegment"), "AEIOU", "aeiou").as("translated"),
          levenshtein(col("c_mktsegment"), lit("BUILDING")).as("lev"))
        .orderBy("c_custkey")),

    // temporal functions — month bucketing + ISO weekday aggregation
    // (weekday()+1 in Spark ≡ isodow in the oracle: 1=Monday).
    "q54_datetime" -> ((s, d) =>
      Tables.orders(s, d)
        .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
        .withColumn("isodow", (weekday(col("o_orderdate")) + 1).cast("int"))
        .groupBy("month", "isodow").agg(count(lit(1)).as("n"))
        .orderBy("month", "isodow")),

    // conditional/boolean aggregates — count_if / bool_and / bool_or.
    "q55_conditional_agg" -> ((s, d) =>
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(expr("count_if(l_discount > 0.05)").as("n_discounted"),
          expr("bool_and(l_quantity > 0)").as("all_positive"),
          expr("bool_or(l_tax > 0.07)").as("any_high_tax"))
        .orderBy("l_returnflag")),

    // array higher-order functions — transform/filter/aggregate over
    // the token column, no explode (the per-row columnar idiom).
    "q56_array_hof" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("tk", split(col("text"), " "))
        .select(col("doc_id"),
          expr("CAST(size(filter(tk, x -> length(x) > 3)) AS BIGINT)")
            .as("n_long_tokens"),
          expr("CAST(array_max(transform(tk, x -> length(x))) AS BIGINT)")
            .as("max_tok_len"),
          expr("CAST(aggregate(transform(tk, x -> length(x)), 0, (a, v) -> a + v) AS BIGINT)")
            .as("total_chars"))
        .orderBy("doc_id")),

    // ranking functions — percent_rank / cume_dist with unique tiebreak.
    "q57_rank_functions" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("pr", round(percent_rank().over(w), 6))
        .withColumn("cd", round(cume_dist().over(w), 6))
        .select("o_orderkey", "pr", "cd")
        .orderBy("o_orderkey")
    }),

    // lag/lead — per-user value deltas and next-event lookahead.
    "q58_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("delta", round(col("value") - lag(col("value"), 1).over(w), 4))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .select(col("event_id"),
          coalesce(col("delta"), lit(0.0)).as("delta"),
          coalesce(col("next_type"), lit("none")).as("next_type"))
        .orderBy("event_id")
    }),

    // P7 literal form — MapType column construction + keyed extraction
    // with defaults (the imp_dict.get(v, [0,0]) contract as a map col).
    "q59_map_extract" -> ((s, d) => {
      val m = Tables.events(s, d).groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("c"))
        .groupBy("user_id")
        .agg(map_from_entries(collect_list(struct(col("event_type"), col("c"))))
          .as("type_counts"))
      m.select(col("user_id"),
          coalesce(try_element_at(col("type_counts"), lit("click")), lit(0L))
            .as("click_cnt"),
          coalesce(try_element_at(col("type_counts"), lit("nosuch")), lit(0L))
            .as("missing_cnt"))
        .orderBy("user_id")
    }),

    // J4 general form — as-of join: every event enriched with the most
    // recent signup value at-or-before its timestamp (union +
    // last-value window; DuckDB's native ASOF JOIN is the oracle).
    "q43_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy("user_id", "ts").agg(max(col("value")).as("signup_value"))
      AsOfJoin(ev.select("user_id", "ts", "event_id"), signups,
          "user_id", "ts", "ts", Seq("signup_value"), "signup_value")
        .select(col("event_id"),
          coalesce(col("signup_value"), lit(-1.0)).as("signup_value"))
        .orderBy("event_id")
    }),

    // skew path — two-phase salted aggregation; must equal the direct
    // groupBy (the oracle IS the direct form). Sums run on DECIMAL so
    // the salted regrouping is bit-exact regardless of partitioning.
    "q42_salted_group_agg" -> ((s, d) =>
      MetricOps.saltedCountSum(
          Tables.events(s, d)
            .withColumn("value_dec", col("value").cast("decimal(18,6)")),
          "user_id", "value_dec", 8)
        .select(col("user_id"), col("cnt"),
          round(col("sum").cast("double"), 2).as("sum_value"))
        .orderBy("user_id")),

    // ops/scale composition — the training-data curation flow as ONE
    // lazy plan: quality gate → exact dedup (keep min id) → MinHash
    // near-dup removal (greedy keep-smaller) → surviving corpus.
    "q41_corpus_clean" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val quality = TextOps.qualityScore(docs, "doc_id", "text", STOPWORDS)
        .filter(col("quality") >= 0.3 && col("n_tokens") >= 20)
        .select("doc_id")
      val kept = docs.join(quality, "doc_id")
      val canon = kept.groupBy("text").agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      val uniq = kept.join(canon, "doc_id")
      val pairs = DedupOps.minhashCandidates(
        DedupOps.minhashSignature(
          DedupOps.shingles(uniq, "doc_id", "text"), "doc_id", 4, 2),
        "doc_id", 4, 2)
      uniq.join(pairs.select(col("doc_b").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),

    // ops/scale — deterministic stratified sampling: keep all positives,
    // 20% of negatives, selected by a stable md5 key hash (re-run- and
    // partitioning-invariant — the label-balancing downsample).
    "q61_stratified_sample" -> ((s, d) =>
      SamplingOps.stratifiedSample(labeled(s, d), "event_id",
          when(col("label") === 1, 1.0).otherwise(0.2))
        .select("event_id", "label").orderBy("event_id")),

    // ops/scale — TF-IDF keyword weights per (doc, token).
    "q62_tfidf" -> ((s, d) =>
      TextOps.tfidf(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id", "token")),

    // ops/scale — dedup CLUSTERS: connected components over the banded
    // MinHash candidate graph (min-label propagation; DuckDB oracle is
    // the recursive-CTE transitive closure).
    "q63_dedup_clusters" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = DedupOps.minhashCandidates(
        DedupOps.minhashSignature(
          DedupOps.shingles(docs, "doc_id", "text"), "doc_id", 4, 2),
        "doc_id", 4, 2)
      GraphOps.connectedComponents(docs.select("doc_id"), "doc_id",
          pairs, "doc_a", "doc_b")
        .select(col("node").as("doc_id"), col("label").as("cluster_id"))
        .orderBy("doc_id")
    }),

    // ops/scale — hashing-trick feature encode (fixed-width buckets for
    // unbounded categoricals, no vocabulary pass).
    "q64_feature_hash" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_custkey"),
          SamplingOps.featureHash(col("c_mktsegment"), 64).as("seg_bucket"),
          SamplingOps.featureHash(col("c_name"), 1024).as("name_bucket"))
        .orderBy("c_custkey")),

    // §2.9 composition — per-session aggregates (event count, µs
    // duration, click count) over the 30-min-gap sessionization.
    "q65_session_stats" -> ((s, d) =>
      TextOps.sessionize(labeled(s, d), "user_id", "ts", "event_id", 1800L)
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
            .as("duration_us"),
          sum(col("label")).cast("long").as("n_clicks"))
        .orderBy("user_id", "session_id")),

    // band/range join — per-user count of event pairs ≤5 minutes apart
    // (equi-join on the user key + range predicate; never a cartesian).
    "q66_event_pairs_range_join" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("tsu"), col("event_id"))
      val a = e.select(col("user_id"), col("tsu").as("tsu_a"), col("event_id").as("id_a"))
      val b = e.select(col("user_id"), col("tsu").as("tsu_b"), col("event_id").as("id_b"))
      a.join(b, Seq("user_id"))
        .filter((col("tsu_b") > col("tsu_a") ||
            (col("tsu_b") === col("tsu_a") && col("id_b") > col("id_a"))) &&
          col("tsu_b") - col("tsu_a") <= 300000000L)
        .groupBy("user_id").agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    }),

    // OLAP cube — all grouping-set combinations with indicators.
    "q67_cube" -> ((s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(grouping(col("l_returnflag")).cast("int").as("g1"),
          grouping(col("l_linestatus")).cast("int").as("g2"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("g1"), col("g2"), col("sum_qty"), col("n"))
        .orderBy("g1", "g2", "returnflag", "linestatus")),

    // statistical aggregates — Pearson correlation + covariance per
    // group (profiling surface; co-moment formulas in both engines).
    "q68_corr_covar" -> ((s, d) =>
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_s"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 2).as("covar_p"))
        .orderBy("l_returnflag")),

    // ops/scale — SimHash near-dup: nibble-banded candidates + exact
    // Hamming verify (recall 1.0 for the ≤3 threshold by pigeonhole).
    "q69_simhash_neardup" -> ((s, d) =>
      DedupOps.simhashNearDup(Tables.documents(s, d), "doc_id", "text", 3)
        .orderBy("doc_a", "doc_b")),

    // ops/scale — IVF index build: per-cell centroid of the sign-bucket
    // quantizer (the k-means update-step shape, distributed).
    "q70_ivf_centroids" -> ((s, d) =>
      SimilarityOps.ivfCentroids(Tables.embeddings(s, d), "vec_id", "embedding", 4)
        .orderBy("bucket", "dim")),

    // keep-latest dedup — the SCD-style snapshot: most recent event per
    // user (row_number desc = 1); the state-compaction op of any
    // incremental pipeline.
    "q71_latest_snapshot" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")
    }),

    // OLAP grouping sets — independent marginals in one pass (neither
    // rollup nor cube: exactly the requested sets).
    "q72_grouping_sets" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupingSets(Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
        .orderBy("returnflag", "linestatus")),

    // ops/scale — corpus bigram frequency (contamination/memorization
    // audit counter; every occurrence, not per-doc distinct).
    "q73_bigram_freq" -> ((s, d) =>
      TextOps.ngramFrequency(Tables.documents(s, d), "text", 2)
        .orderBy("ngram")),

    // window value functions — first/last/nth event type per user frame
    // (the "first touch / last touch" attribution shape).
    "q74_value_windows" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .withColumn("first_type", first(col("event_type")).over(full))
        .withColumn("last_type", last(col("event_type")).over(full))
        .withColumn("second_type",
          coalesce(nth_value(col("event_type"), 2).over(full), lit("none")))
        .select("event_id", "first_type", "last_type", "second_type")
        .orderBy("event_id")
    }),

    // running ratio — cumulative CTR per user up to AND INCLUDING each
    // event (monotone state the serving layer reads as "user CTR so
    // far"); integer sums divided once, rounded.
    "q75_running_ctr" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      labeled(s, d)
        .withColumn("cum_clk", sum(col("label")).over(w))
        .withColumn("cum_imp", count(lit(1)).over(w))
        .select(col("event_id"),
          round(col("cum_clk").cast("double") / col("cum_imp"), 6).as("ctr"))
        .orderBy("event_id")
    }),

    // structured text extraction — regexp parse of the props blob into
    // typed fields (the log-parsing op of any ingest pipeline).
    "q76_regex_extract" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long").as("k_num"),
          (regexp_count(col("props"), lit("\\d")) > 0).cast("int").as("has_digit"),
          length(regexp_replace(col("props"), "[^{}:,\"]", "")).cast("long")
            .as("n_structural"))
        .orderBy("event_id")),

    // robust profiling — median absolute deviation per group (two
    // percentile passes; the group medians broadcast back).
    "q77_mad" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val med = li.groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("med"))
      li.join(broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(round(expr("percentile(abs(l_quantity - med), 0.5)"), 6).as("mad"))
        .orderBy("l_returnflag")
    }),

    // fixed-width histogram — the profiling binning (floor division,
    // identical IEEE arithmetic in both engines).
    "q78_histogram" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(floor(col("l_extendedprice") / 5000.0).cast("long").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n"))
        .orderBy("bin")),

    // bounded TopKAggregator as an ORACLE-CHECKED query: per-user top-3
    // events by value — the custom TypedImperativeAggregate path (map-side
    // ≤k buffers, no window sort); oracle is the row_number twin.
    "q79_topk_aggregator" -> ((s, d) =>
      Tables.events(s, d).groupBy("user_id")
        .agg(graft.functions.TopKAggregator.topK(3, col("value"), col("event_id"))
          .as("top"))
        .select(col("user_id"), explode(col("top")).as("t"))
        .select(col("user_id"), col("t.id").as("event_id"), col("t.score").as("value"))
        .orderBy("user_id", "event_id")),

    // J4 with tolerance — as-of join that only accepts matches within 3
    // days (stale state falls back to the miss default).
    "q80_asof_tolerance" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy("user_id", "ts").agg(max(col("value")).as("signup_value"))
        .withColumn("s_ts", col("ts"))
      AsOfJoin(ev.select("user_id", "ts", "event_id"), signups,
          "user_id", "ts", "ts", Seq("signup_value", "s_ts"), "ts")
        .select(col("event_id"),
          when(col("s_ts").isNotNull &&
              unix_micros(col("ts")) - unix_micros(col("s_ts")) <= 259200000000L,
            col("signup_value")).otherwise(-1.0).as("signup_value"))
        .orderBy("event_id")
    }),

    // sequence pattern — MATCH_RECOGNIZE-lite: for each error event,
    // did a purchase follow within the next 3 events (lead windows)?
    "q81_sequence_pattern" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("n1", lead(col("event_type"), 1).over(w))
        .withColumn("n2", lead(col("event_type"), 2).over(w))
        .withColumn("n3", lead(col("event_type"), 3).over(w))
        .filter(col("event_type") === "error")
        .select(col("event_id"),
          coalesce(col("n1") === "purchase" || col("n2") === "purchase" ||
            col("n3") === "purchase", lit(false)).cast("int").as("recovered"))
        .orderBy("event_id")
    }),

    // cohort retention — users active in week w AND w+1 (distinct
    // user-week grid, self semi-join on the next week).
    "q82_weekly_retention" -> ((s, d) => {
      val uw = Tables.events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000 div 7").as("wk"))
        .distinct()
      val act = uw.groupBy("wk").agg(count(lit(1)).as("n_active"))
      // renamed right side (not .alias): fresh attribute ids, so the
      // self-join needs no ambiguity fix-up (and logs no warning).
      val nxt = uw.select(col("user_id").as("__u2"), col("wk").as("__wk2"))
      val ret = uw
        .join(nxt,
          col("user_id") === col("__u2") && col("__wk2") === col("wk") + 1,
          "left_semi")
        .groupBy("wk").agg(count(lit(1)).as("n_retained"))
      act.join(ret, Seq("wk"), "left")
        .na.fill(0L, Seq("n_retained"))
        .select(col("wk"), col("n_active"), col("n_retained"),
          round(col("n_retained").cast("double") / col("n_active"), 6).as("retention"))
        .orderBy("wk")
    }),

    // funnel — first click → first subsequent purchase per user, with
    // conversion flag and µs lag (the offline conversion metric).
    "q83_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tsu"))
      val fc = ev.filter(col("event_type") === "click")
        .groupBy("user_id").agg(min(col("tsu")).as("fc"))
      val fp = ev.filter(col("event_type") === "purchase")
        .join(fc, "user_id").filter(col("tsu") > col("fc"))
        .groupBy("user_id").agg(min(col("tsu")).as("fp"))
      fc.join(fp, Seq("user_id"), "left")
        .select(col("user_id"),
          col("fp").isNotNull.cast("int").as("converted"),
          coalesce(col("fp") - col("fc"), lit(-1L)).as("lag_us"))
        .orderBy("user_id")
    }),

    // star join (TPC-H Q3 shape) — selective dim filter, two fact joins,
    // DECIMAL-exact revenue (per-row double product rounded to 4dp, then
    // exact decimal sum — no distributed-order drift), top-10.
    "q84_shipping_priority" -> ((s, d) =>
      Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > lit("1996-01-01").cast("timestamp"))
        .groupBy("l_orderkey")
        .agg(sum(expr("CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))"))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)),

    // 6-way snowflake join (TPC-H Q5 shape) — region→nation→customer
    // chain broadcast onto the fact tables; revenue per nation.
    "q85_region_revenue" -> ((s, d) => {
      val dims = broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")
        .join(Tables.nation(s, d), col("r_regionkey") === col("n_regionkey")))
      Tables.customer(s, d)
        .join(dims, col("c_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy("n_name")
        .agg(sum(expr("CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))"))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),

    // skew path (join form) — salted equi-join must equal the plain
    // join (the oracle IS the plain form), with the hot key spread over
    // 8 salt buckets.
    "q86_salted_join" -> ((s, d) => {
      val dim = Tables.customer(s, d).filter(col("c_custkey") < 150)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      MetricOps.saltedJoin(
          Tables.events(s, d).select("event_id", "user_id"), dim,
          "user_id", SamplingOps.hashUnit(col("event_id")), 8)
        .select("event_id", "user_id", "c_mktsegment")
        .orderBy("event_id")
    }),

    // windowed distinct count — variety of the trailing ≤10 events per
    // user (Spark: array_distinct over a bounded collect_list frame;
    // the oracle uses DISTINCT window aggregation directly).
    "q87_window_distinct" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-9, 0)
      Tables.events(s, d)
        .withColumn("n_types",
          size(array_distinct(collect_list(col("event_type")).over(w))).cast("long"))
        .select("event_id", "n_types").orderBy("event_id")
    }),

    // gaps-and-islands — longest consecutive click streak per user
    // (rn minus per-subset rn groups runs; two windows + two aggs).
    "q88_click_streaks" -> ((s, d) => {
      val rn = RelationalOps.rowNumber(labeled(s, d), "user_id", userOrder)
      val w2 = Window.partitionBy("user_id").orderBy(col("rn"))
      rn.filter(col("label") === 1)
        .withColumn("grp", col("rn") - row_number().over(w2))
        .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
        .groupBy("user_id").agg(max(col("len")).as("max_streak"))
        .orderBy("user_id")
    }),

    // SCD1 upsert — updates win per key, unmatched base survives (the
    // MERGE-into compaction of an incremental pipeline).
    "q89_upsert" -> ((s, d) => {
      val base = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
      val updates = base.filter(col("c_custkey") < 50)
        .withColumn("c_mktsegment", lit("VIP"))
      RelationalOps.upsert(base, updates, "c_custkey")
        .orderBy("c_custkey")
    }),

    // CDC snapshot diff — added/removed/changed keys between two table
    // states, one full outer join.
    "q90_snapshot_diff" -> ((s, d) => {
      val old = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
      val neu = RelationalOps.upsert(old,
          old.filter(col("c_custkey") < 50).withColumn("c_mktsegment", lit("VIP")),
          "c_custkey")
        .filter(col("c_custkey") < 1400)
      RelationalOps.snapshotDiff(old, neu, "c_custkey", Seq("c_mktsegment"))
        .orderBy("c_custkey")
    }),

    // embedding int8 quantization — per-vector min/max scale, first-4
    // quantized codes + max reconstruction error (the vector-compression
    // step of an embedding store; pure array HOFs).
    "q91_embedding_quantize" -> ((s, d) =>
      Tables.embeddings(s, d)
        .withColumn("emb", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("mn", array_min(col("emb")))
        .withColumn("scale",
          when(array_max(col("emb")) === col("mn"), lit(1.0))
            .otherwise((array_max(col("emb")) - col("mn")) / 255.0))
        .withColumn("q", expr("transform(emb, x -> CAST(round((x - mn) / scale) AS INT))"))
        .withColumn("max_err", expr(
          "round(array_max(transform(sequence(0, size(emb) - 1), " +
            "i -> abs(emb[i] - (q[i] * scale + mn)))), 6)"))
        .select(col("vec_id"),
          expr("q[0]").as("q0"), expr("q[1]").as("q1"),
          expr("q[2]").as("q2"), expr("q[3]").as("q3"),
          col("max_err"))
        .orderBy("vec_id")),

    // exact-N deterministic per-group sample — "random" 5 events per
    // user ordered by a key hash (stable across runs/partitionings).
    "q92_group_sample" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(md5(col("event_id").cast("string")), col("event_id"))
      Tables.events(s, d)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 5)
        .select("user_id", "event_id")
        .orderBy("user_id", "event_id")
    }),

    // ops/scale — perplexity-style quality filter: per-doc bigram
    // cross-entropy under the corpus's own MLE bigram LM.
    "q93_bigram_lm" -> ((s, d) =>
      TextOps.bigramCrossEntropy(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // ops/scale — benchmark contamination: per src0 ("benchmark") doc,
    // the fraction of its distinct shingles present anywhere in the
    // rest of the corpus (semi-join against the distinct corpus set).
    "q94_contamination" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val bench = DedupOps.shingles(docs.filter(col("source") === "src0"),
        "doc_id", "text")
      val corpus = DedupOps.shingles(docs.filter(col("source") =!= "src0"),
        "doc_id", "text").select("shingle").distinct()
      val hits = bench.join(corpus, Seq("shingle"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
      bench.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          col("n_sh"),
          round(coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_sh"), 6)
            .as("contamination"))
        .orderBy("doc_id")
    }),

    // one-scan table profile — nulls / distinct / min / max per column.
    "q95_table_profile" -> ((s, d) =>
      graft.operators.QualityChecks.profile(Tables.customer(s, d),
          Seq("c_custkey", "c_name", "c_mktsegment", "c_nationkey"))
        .orderBy("col_name")),

    // ops/scale — PII redaction: ordered regex rules, one codegen pass.
    "q96_pii_redact" -> ((s, d) =>
      TextOps.redact(Tables.customer(s, d), "c_custkey", "c_name",
          TextOps.piiRules)
        .orderBy("c_custkey")),

    // ops/scale — Gopher-style repetition signals + junk flag.
    "q97_repetition" -> ((s, d) =>
      TextOps.repetitionStats(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // ops/scale — cross-doc chunk dedup (C4-style line dedup), keeping
    // the globally-first occurrence of every 20-token chunk.
    "q98_chunk_dedup" -> ((s, d) =>
      DedupOps.chunkDedup(Tables.documents(s, d), "doc_id", "text", 20)
        .orderBy("doc_id")),

    // ops/scale — data-mixture sampling: target source proportions →
    // largest feasible sample, drawn by deterministic md5 membership.
    "q99_mixture_sample" -> ((s, d) =>
      MixtureOps.mixtureSample(Tables.documents(s, d), "source", "doc_id",
          Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
        .orderBy("source")),

    // ops/scale — per-source quantile quality gate: keep docs at or
    // above their own source's 25th-percentile quality score.
    "q101_quality_gate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val scored = TextOps.qualityScore(docs, "doc_id", "text", STOPWORDS)
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
      MixtureOps.quantileGate(scored, "source", "doc_id", "quality", 0.25)
        .orderBy("source")
    }),

    // S10/R1 full form — BM25 relevance ranking for a term query (the
    // scoring behind the reference's ES terms retrieval).
    "q102_bm25" -> ((s, d) =>
      RetrievalOps.bm25(Tables.documents(s, d), "doc_id", "text",
        Seq("spark", "join", "scan"), topK = 20)),

    // A9 list-wise — per-user NDCG@10 / MRR@10 / recall@10 over the
    // value-ranked event list (purchases as positives).
    "q103_ranking_metrics" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("event_id"),
        col("value").as("score"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("label"))
      MetricOps.rankingMetrics(ev, "user_id", "event_id", "score", "label", 10)
        .orderBy("user_id")
    }),

    // ops/scale — EXACT set-similarity join (prefix filtering): every
    // doc pair with shingle-Jaccard ≥ 0.6, recall 1.0 without LSH tuning.
    "q104_setsim_join" -> ((s, d) =>
      DedupOps.setSimJoin(
          DedupOps.shingles(Tables.documents(s, d), "doc_id", "text"),
          "doc_id", "shingle", 0.6)
        .orderBy("doc_a", "doc_b")),

    // ML eval — calibration curve: mean predicted score vs observed
    // positive rate per score decile.
    "q105_calibration" -> ((s, d) => {
      val ev = Tables.events(s, d).select(
        least(col("value") / lit(200.0), lit(1.0)).as("score"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("label"))
      MetricOps.calibration(ev, "score", "label", 10).orderBy("bin")
    }),

    // data-ops — PSI feature drift between two halves of the stream.
    "q106_psi_drift" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("value"),
        when(col("event_id") % 2 === 0, "e").otherwise("a").as("side"))
      MetricOps.psi(ev, "value", "side", "e", 50.0, 10).orderBy("bin")
    }),

    // ops/scale — weighted sampling WITHOUT replacement (Efraimidis–
    // Spirakis keys over deterministic md5 uniforms), quality-weighted.
    "q107_weighted_sample" -> ((s, d) => {
      val scored = TextOps.qualityScore(Tables.documents(s, d), "doc_id",
          "text", STOPWORDS)
        .select(col("doc_id"), greatest(col("quality"), lit(0.0001)).as("w"))
      SamplingOps.weightedSample(scored, "doc_id", "w", 40).orderBy("doc_id")
    }),

    // OLAP — TPC-H Q1 pricing summary (full form): per-row products
    // rounded then summed as DECIMAL so partial-agg order can't move
    // the hash; averages divide the exact sums.
    "q108_tpch_q1" -> ((s, d) => {
      def dec(c: org.apache.spark.sql.Column) =
        round(c, 6).cast("decimal(28,10)")
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        // exact sums ship as DECIMAL strings: a decimal→double cast is
        // the one step whose rounding differs between engines
        .agg(
          sum(dec(col("l_quantity"))).cast("string").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("string").as("sum_base_price"),
          sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .cast("string").as("sum_disc_price"),
          sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax")))).cast("string").as("sum_charge"),
          round(sum(dec(col("l_quantity"))).cast("double") / count(lit(1)), 6)
            .as("avg_qty"),
          round(sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1)), 6)
            .as("avg_price"),
          round(sum(dec(col("l_discount"))).cast("double") / count(lit(1)), 6)
            .as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // recsys — deterministic negative sampling: 5 md5-drawn unseen
    // parts per customer (stable under re-runs/partitioning).
    "q109_negative_sample" -> ((s, d) => {
      val seen = Tables.orders(s, d).filter(col("o_custkey") < 200)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("custkey"), col("l_partkey").as("partkey"))
      val catalog = Tables.part(s, d).filter(col("p_partkey") < 500)
        .select(col("p_partkey").as("partkey"))
      RetrievalOps.negativeSample(seen, catalog, "custkey", "partkey", 5)
        .orderBy("custkey", "partkey")
    }),

    // recsys — item-to-item co-occurrence recall with PMI scoring
    // (capped per-user lists; the non-model recall channel).
    "q110_i2i_pmi" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"),
        col("ts"))
      RetrievalOps.i2iPmi(ev, "user_id", "item", "ts", 20, 2L, 5)
        .orderBy("item_a", "item_b")
    }),

    // ops/scale — sequence-packing plan: docs → 2048-token bins per
    // source (greedy contiguous fill, parallel across sources).
    "q111_seq_packing" -> ((s, d) =>
      TextOps.packSequences(Tables.documents(s, d), "source", "doc_id",
          "text", 2048L)
        .orderBy("source", "bin")),

    // data-ops — leakage audit over the W4 split: per split boundary,
    // count users whose train rows reach past any test/holdout row in
    // EVENT TIME (must be zero — the no-leakage invariant as a query,
    // not just a property test).
    "q112_leakage_audit" -> ((s, d) => {
      val rn = RelationalOps.rowNumber(Tables.events(s, d), "user_id", userOrder)
      val split = RelationalOps.threeWaySplit(
        rn.withColumn("u_cnt", count(lit(1)).over(Window.partitionBy("user_id"))),
        "rn", "u_cnt", HOLD_N, TEST_RATIO)
      val b = split.groupBy("user_id").agg(
        max(when(col("istest") === 0, col("ts"))).as("max_train_ts"),
        min(when(col("istest") =!= 0, col("ts"))).as("min_eval_ts"))
      b.agg(count(lit(1)).as("n_users"),
        sum(coalesce((col("max_train_ts") > col("min_eval_ts")).cast("long"),
          lit(0L))).cast("long").as("n_violations"))
    }),

    // J4, native physical form — sort-merge AsOfJoinExec planned from
    // the graft_asof-marked Join by the injected strategy: each click
    // picks up the user's latest at-or-before purchase (inner as-of).
    "q100_asof_exec" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("value").as("p_value"))
      AsOfJoin.exec(clicks, purch, Seq("user_id"), "ts", "p_ts")
        .select(clicks("event_id"), clicks("user_id"),
          unix_micros(col("p_ts")).as("p_ts_us"), col("p_value"))
        .orderBy("event_id")
    }),

    // LLM-pipeline — winnowing fingerprints (MOSS local-min rolling
    // hash): position-robust copied-span detection, the localizing
    // complement of MinHash's whole-set resemblance.
    "q113_winnow_fingerprint" -> ((s, d) =>
      TextOps.winnow(Tables.documents(s, d), "doc_id", "text", 3, 4)
        .orderBy("doc_id")),

    // retrieval — reciprocal-rank fusion of two recall channels
    // (click-count vs max-purchase-value rankings); the calibration-free
    // hybrid-search merge.
    "q114_rrf_fusion" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"),
        col("event_type"), col("value"))
        .filter(col("item").isNotNull)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "item")
        .agg(count(lit(1)).cast("double").as("score"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "item")
        .agg(max(col("value")).as("score"))
      RetrievalOps.rrfFuse(clicks, purchases, "user_id", "item", "score",
          60, 3)
        .orderBy("user_id", "rank")
    }),

    // feature-engi — smoothed target encoding (empirical-Bayes
    // shrinkage toward the in-plan rounded prior).
    "q115_target_encode" -> ((s, d) =>
      EncodeOps.targetEncode(
        Tables.orders(s, d).select(col("o_orderpriority").as("cat"),
          (col("o_orderstatus") === "F").cast("int").as("label")),
        "cat", "label", 20.0)
        .orderBy("cat")),

    // layout — Z-order (Morton) clustering key + per-bucket span report:
    // the OPTIMIZE ZORDER analogue that makes min/max file stats
    // selective on BOTH dimensions at 100 TB.
    "q116_zorder_layout" -> ((s, d) =>
      LayoutOps.zOrderStats(
        Tables.lineitem(s, d).select((col("l_partkey") % 1024).as("x"),
          (col("l_suppkey") % 1024).as("y")),
        "x", "y", 10, 12)
        .orderBy("z_bucket")),

    // sketch — KMV (bottom-k) distinct estimate per event type, with
    // exact calibration columns; md5-deterministic, so the ESTIMATE
    // itself is oracle-checkable (HLL's is engine-private).
    "q117_kmv_distinct" -> ((s, d) =>
      SketchOps.kmvDistinct(Tables.events(s, d), "event_type", "user_id", 64)
        .orderBy("event_type")),

    // ops/stats — mutual information: model-free feature-vs-label
    // relevance over exact contingency counts.
    "q118_mutual_info" -> ((s, d) =>
      MetricOps.mutualInfo(
        Tables.events(s, d)
          .withColumn("label", (col("value") > 100).cast("int")),
        "event_type", "label")),

    // ops/sketch — Count-Min frequency estimates for the heaviest keys,
    // exact counts alongside so the overcount is visible.
    "q119_cms_heavy_hitters" -> ((s, d) =>
      SketchOps.cmsHeavyHitters(Tables.events(s, d), "user_id")
        .orderBy(col("exact_c").desc, col("user_id"))),

    // ops/stats — Spearman rank correlation per group (histogram-derived
    // average-tie ranks; no raw-row global window).
    "q120_spearman" -> ((s, d) =>
      MetricOps.spearman(Tables.lineitem(s, d), "l_returnflag",
        "l_quantity", "l_extendedprice").orderBy("l_returnflag")),

    // ops/text — corpus unigram entropy (decimal-summed ln terms).
    "q121_token_entropy" -> ((s, d) =>
      TextOps.tokenEntropy(Tables.documents(s, d), "text")),

    // ops/text — Jensen–Shannon drift between even/odd doc_id slices.
    "q122_js_divergence" -> ((s, d) =>
      TextOps.jsDivergence(Tables.documents(s, d), "text",
        col("doc_id") % 2 === 0)),

    // ops/dedup — asymmetric containment (small doc swallowed by a
    // bigger one): inverted-index candidates + size precondition.
    "q123_containment_join" -> ((s, d) =>
      DedupOps.containmentJoin(Tables.documents(s, d), "doc_id", "text", 0.8)
        .orderBy("doc_a", "doc_b")),

    // ops/sketch — Bloom membership probe of customers against the
    // top-1000-by-order-count key set; per-segment FP calibration.
    "q124_bloom_membership" -> ((s, d) => {
      val top = Tables.orders(s, d).groupBy("o_custkey")
        .agg(count(lit(1)).as("__c"))
        .orderBy(col("__c").desc, col("o_custkey")).limit(1000)
      SketchOps.bloomMembership(top, "o_custkey",
        Tables.customer(s, d), "c_custkey", "c_mktsegment")
        .orderBy("c_mktsegment")
    }),

    // OLAP — TPC-H Q18 shape: large-quantity orders (integral-double
    // sums are exact, so the HAVING guard is engine-stable).
    "q125_tpch_q18" -> ((s, d) => {
      val big = Tables.lineitem(s, d).groupBy("l_orderkey")
        .agg(sum("l_quantity").cast("long").as("sum_qty"))
        .filter(col("sum_qty") > 150)
      big.join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("sum_qty").desc, col("o_orderkey")).limit(100)
    }),

    // ops/retrieval — exact dyadic time-decayed engagement (2^-⌊age/hl⌋
    // weights: reproducible without rounding).
    "q126_decayed_popularity" -> ((s, d) =>
      RetrievalOps.decayedPopularity(Tables.events(s, d), "user_id", "ts",
        halflifeDays = 30)),

    // ops/encode — robust median/IQR scaling per segment.
    "q127_robust_scale" -> ((s, d) =>
      EncodeOps.robustScale(Tables.customer(s, d), "c_mktsegment", "c_acctbal")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          col("c_acctbal_robust"))
        .orderBy("c_custkey")),

    // OLAP — TPC-H Q10 shape: returned-item revenue per customer over a
    // date window; decimal-exact revenue (q84/q85 discipline), top-20.
    "q128_tpch_q10" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1995-07-01").cast("timestamp"))
        .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum(expr(
          "CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))"))
          .cast("double").as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey")).limit(20)),

    // OLAP — TPC-H Q6 shape: single-pass filtered revenue aggregate
    // (every predicate pushed to the scan; decimal-exact sum).
    "q130_tpch_q6" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum(expr(
          "CAST(round(l_extendedprice * l_discount, 4) AS DECIMAL(18,4))"))
          .cast("double").as("revenue"), count(lit(1)).as("n_items"))),

    // OLAP — TPC-H Q14 shape: promo revenue share over a month
    // (broadcast part dim; conditional decimal-exact sums).
    "q131_tpch_q14" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100) * sum(expr(
            "CAST(CASE WHEN p_type = 'PROMO' THEN " +
              "round(l_extendedprice * (1 - l_discount), 4) ELSE 0 END " +
              "AS DECIMAL(18,4))")).cast("double")
          / sum(expr(
            "CAST(round(l_extendedprice * (1 - l_discount), 4) " +
              "AS DECIMAL(18,4))")).cast("double"), 6).as("promo_pct"),
          count(lit(1)).as("n_items"))),

    // OLAP — TPC-H Q13 shape: customer order-count distribution
    // (left join keeps zero-order customers; two stacked hash aggs).
    "q133_tpch_q13" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)),

    // ops/sketch — histogram-interpolated quantile (mergeable bins; the
    // one-pass alternative to exact percentile's per-group sort), with
    // the exact value alongside for calibration.
    "q132_histogram_quantile" -> ((s, d) =>
      SketchOps.histogramQuantile(Tables.orders(s, d), "o_orderpriority",
          "o_totalprice", binWidth = 5000.0, nBins = 200, q = 0.95)
        .orderBy("o_orderpriority")),

    // ops/graph — deterministic PageRank over the near-dup candidate
    // graph (decimal-exact inbound mass per iteration).
    "q129_pagerank" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = DedupOps.minhashCandidates(
        DedupOps.minhashSignature(
          DedupOps.shingles(docs, "doc_id", "text"), "doc_id", 4, 2),
        "doc_id", 4, 2)
      val ed = pairs.select(col("doc_a").as("es"), col("doc_b").as("ed"))
        .unionAll(pairs.select(col("doc_b").as("es"), col("doc_a").as("ed")))
      GraphOps.pageRankPortable(docs.select("doc_id"), "doc_id",
          ed, "es", "ed", 3)
        .select(col("node").as("doc_id"), col("rank"))
        .orderBy("doc_id")
    }),

    // ops/join — grid-blocked interval overlap self-join: event activity
    // windows [ts, ts + value seconds] per user; candidates from the
    // (user, hour-bin) equi-join, exact overlap verify, never per-user².
    "q134_interval_overlap" -> ((s, d) => {
      val iv = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("lo"),
          (unix_micros(col("ts")) +
            floor(col("value") * 1000000L).cast("long")).as("hi"))
      JoinOps.intervalOverlapJoin(iv, "user_id", "event_id", "lo", "hi",
          binWidth = 3600000000L)
        .select(col("user_id"), col("id_a"), col("id_b"),
          col("overlap").as("overlap_us"))
        .orderBy("user_id", "id_a", "id_b")
    }),

    // ops/graph — triangle count over the co-supplier graph (suppliers
    // sharing an order, arithmetically sparsified): degree-ordered
    // orientation bounds the wedge join at O(|E|^1.5) under any skew.
    "q135_triangle_count" -> ((s, d) => {
      val edges = Tables.lineitem(s, d).alias("l1")
        .join(Tables.lineitem(s, d).alias("l2"),
          col("l1.l_orderkey") === col("l2.l_orderkey") &&
            col("l1.l_suppkey") < col("l2.l_suppkey"))
        .select(col("l1.l_suppkey").as("sa"), col("l2.l_suppkey").as("sb"))
        .filter((col("sa") * 31 + col("sb")) % 20 === 0)
      GraphOps.triangleCount(edges, "sa", "sb")
    }),

    // ops/join — Bloom-prefiltered fact join: lineitem rows survive a
    // broadcast Bloom of high-value orderkeys map-side before the join;
    // output provably equals the plain join (the oracle IS the plain
    // join), the filter only cuts what the fact side shuffles.
    "q136_bloom_prefilter_join" -> ((s, d) => {
      val bigOrders = Tables.orders(s, d)
        .filter(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      JoinOps.bloomPrefilterJoin(
          Tables.lineitem(s, d).select("l_orderkey", "l_quantity",
            "l_extendedprice"),
          bigOrders, "l_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity")).cast("long").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy("o_orderpriority")
    }),

    // OLAP — TPC-H Q4 shape: priority checking via EXISTS rewritten as a
    // left-semi join (one shuffle on orderkey; the semi probe never
    // materializes the multi-line fact rows).
    "q137_tpch_q4" -> ((s, d) =>
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d).select("l_orderkey", "l_shipdate"),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")),

    // OLAP — TPC-H Q12 shape (l_returnflag as the ship-mode dimension):
    // fact-to-dim join + conditional counts; the CASE folds into one
    // hash agg, no second pass over the join.
    "q138_tpch_q12" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT" ||
            col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(col("o_orderpriority") =!= "1-URGENT" &&
            col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
            .as("low_line_count"))
        .orderBy("l_returnflag")),

    // OLAP — TPC-H Q15 shape: top supplier by quarterly revenue — the
    // aggregate-vs-global-max pattern. The 1-row max side broadcasts;
    // DECIMAL revenue makes the = comparison engine-exact.
    "q139_tpch_q15" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(sum(expr(
          "CAST(round(l_extendedprice * (1 - l_discount), 4) " +
            "AS DECIMAL(18,4))")).as("__rev"))
      rev.join(broadcast(rev.agg(max(col("__rev")).as("__mx"))),
          col("__rev") === col("__mx"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("__rev").cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // OLAP — TPC-H Q17 shape: small-quantity-order revenue. The
    // correlated `l_quantity < 0.2*avg(per part)` subquery becomes a
    // shuffle join against the per-part aggregate; the threshold is
    // compared in integer form (5*qty*cnt < sum) so neither engine
    // divides.
    "q140_tpch_q17" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val perPart = li.groupBy(col("l_partkey").as("__pk"))
        .agg(sum(col("l_quantity")).cast("long").as("__sq"),
          count(lit(1)).as("__cq"))
      li.join(broadcast(Tables.part(s, d)
            .filter(col("p_brand") === "Brand#1" && col("p_type") === "SMALL")),
          col("l_partkey") === col("p_partkey"))
        .join(perPart, col("l_partkey") === col("__pk"))
        .filter(col("l_quantity").cast("long") * 5 * col("__cq") < col("__sq"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double") / 7.0, 4).as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    }),

    // OLAP — TPC-H Q19 shape: OR-of-ANDs predicate over a fact-dim
    // join. Catalyst extracts the common partkey equi-condition and
    // pushes the per-branch brand/size/quantity bands below the join.
    "q141_tpch_q19" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey") && (
            (col("p_brand") === "Brand#1" &&
              col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#2" &&
              col("p_size").between(1, 25) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#3" &&
              col("p_size").between(1, 35) &&
              col("l_quantity").between(20, 30))))
        .agg(sum(expr(
            "CAST(round(l_extendedprice * (1 - l_discount), 4) " +
              "AS DECIMAL(18,4))")).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))),

    // OLAP — TPC-H Q21 shape (shipdate stands in for the missing
    // commit/receipt dates): suppliers that shipped LAST in a
    // multi-supplier order — EXISTS(other supplier) as a left-semi
    // join, NOT EXISTS(other supplier later) as a left-anti join; both
    // reuse the same orderkey shuffle.
    "q142_tpch_q21" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
      val l2 = l.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      val l3 = l.select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"),
        col("l_shipdate").as("d3"))
      l.join(l2, col("l_orderkey") === col("o2") &&
          col("l_suppkey") =!= col("s2"), "left_semi")
        .join(l3, col("l_orderkey") === col("o3") &&
          col("l_suppkey") =!= col("s3") &&
          col("d3") > col("l_shipdate"), "left_anti")
        .select("l_orderkey", "l_suppkey").distinct()
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
    }),

    // OLAP — TPC-H Q22 shape: customers above the global average
    // balance with no URGENT order. The scalar-average subquery
    // broadcasts as a 1-row join and compares in multiply form
    // (bal*cnt > sum, DECIMAL-exact); NOT EXISTS is a left-anti join
    // whose probe side is filter-pruned before the shuffle.
    "q143_tpch_q22" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val avgSide = broadcast(cust.filter(col("c_acctbal") > 0.0)
        .agg(sum(col("c_acctbal").cast("decimal(18,2)")).as("__s"),
          count(lit(1)).as("__n")))
      cust.join(avgSide,
          col("c_acctbal").cast("decimal(18,2)") * col("__n") > col("__s"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
            .as("totacctbal"))
        .orderBy("c_nationkey")
    }),

    // OLAP — TPC-H Q7 volume shipping: revenue between two nations by
    // ship year. Both fact sides pre-filter through broadcast dims
    // (suppliers of the 2 nations; orders of the 2 nations' customers)
    // BEFORE the one fact-fact shuffle on orderkey.
    "q144_tpch_q7" -> ((s, d) => {
      val vol = expr(
        "CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))")
      val pair = Seq("NATION_1", "NATION_2")
      val n1 = broadcast(Tables.nation(s, d)
        .filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("__sk"), col("n_name").as("supp_nation")))
      val n2 = broadcast(Tables.nation(s, d)
        .filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("__ck"), col("n_name").as("cust_nation")))
      val cust = broadcast(Tables.customer(s, d)
        .join(n2, col("c_nationkey") === col("__ck"))
        .select(col("c_custkey"), col("cust_nation")))
      val ord = Tables.orders(s, d)
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("cust_nation"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(n1, col("s_nationkey") === col("__sk"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("int").as("l_year"))
        .agg(sum(vol).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // OLAP — TPC-H Q8 national market share: one nation's share of
    // PROMO-part revenue sold into ASIA, by order year. The share is a
    // conditional-over-total ratio of DECIMAL-exact sums (one division
    // per group); all dims broadcast, one fact-fact shuffle.
    "q145_tpch_q8" -> ((s, d) => {
      val vol = expr(
        "CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))")
      val asiaKeys = broadcast(Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("__ck")))
      val cust = broadcast(Tables.customer(s, d)
        .join(asiaKeys, col("c_nationkey") === col("__ck"))
        .select(col("c_custkey")))
      val ord = Tables.orders(s, d)
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("int").as("o_year"))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_type") === "PROMO")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey").as("__sk"),
              col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("__sk"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_year")
        .agg(round(
            sum(when(col("supp_nation") === "NATION_3", vol)
              .otherwise(lit(0).cast("decimal(18,4)"))).cast("double")
            / sum(vol).cast("double"), 6).as("mkt_share"),
          count(lit(1)).as("n_lines"))
        .orderBy("o_year")
    }),

    // L96 — RAG chunking: overlapping fixed-size token windows with
    // source offsets (map-only; no shuffle).
    "q146_chunk_documents" -> ((s, d) =>
      TextOps.chunkDocuments(Tables.documents(s, d), "doc_id", "text",
          chunkSize = 16, stride = 12)
        .orderBy("doc_id", "chunk_id")),

    // L97 — Johnson–Lindenstrauss ±1 random projection 64→8 dims
    // (md5-seeded sign matrix; map-only).
    "q147_random_projection" -> ((s, d) =>
      SimilarityOps.randomProjection(Tables.embeddings(s, d), "vec_id",
          "embedding", inDim = 64, outDim = 8)
        .orderBy("vec_id")),

    // L98 — Kolmogorov–Smirnov two-sample separation between the score
    // (value) distributions of engagement vs other events.
    "q148_ks_statistic" -> ((s, d) =>
      MetricOps.ksStatistic(
        Tables.events(s, d).withColumn("label",
          when(col("event_type").isin("click", "purchase"), 1).otherwise(0)),
        "label", "value")),

    // L99 — decile lift/gain table for purchase propensity by value.
    "q149_decile_lift" -> ((s, d) =>
      MetricOps.decileLift(
          Tables.events(s, d).withColumn("label",
            when(col("event_type") === "purchase", 1).otherwise(0)),
          "label", "value")
        .orderBy("decile")),

    // L100 — duplicated 5-gram span coverage per document (substring-
    // level dedup signal; Lee et al. 2022).
    "q150_dup_spans" -> ((s, d) =>
      TextOps.dupSpanStats(Tables.documents(s, d), "doc_id", "text", n = 5)
        .orderBy("doc_id")),

    // L101 — Cohen's kappa: chance-corrected agreement between the
    // value-threshold labeling and the event-type labeling.
    "q151_cohens_kappa" -> ((s, d) =>
      MetricOps.cohensKappa(
        Tables.events(s, d).select(
          when(col("value") > 100, 1).otherwise(0).as("r1"),
          when(col("event_type").isin("purchase", "signup"), 1).otherwise(0)
            .as("r2")),
        "r1", "r2")),

    // L102 — A/B test readout: md5-hash arm assignment per user
    // (featureHash — deterministic, partition-invariant), conversion =
    // any purchase; two-proportion z-test from four exact counts.
    "q152_ab_test" -> ((s, d) =>
      MetricOps.abTest(
        Tables.events(s, d)
          .groupBy("user_id")
          .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
            .as("conv"))
          .withColumn("arm",
            SamplingOps.featureHash(col("user_id"), 2).cast("int")),
        "arm", "conv")),

    // L103 — tokenizer vocabulary coverage: top-20 tokens with rank and
    // cumulative corpus coverage (globalRank on the frequency table —
    // no single-partition window at any vocabulary size).
    "q153_vocab_coverage" -> ((s, d) =>
      TextOps.vocabCoverage(Tables.documents(s, d), "text", topN = 20)
        .orderBy("rnk")),

    // L105 — HyperLogLog distinct sketch per value bucket (sizes
    // 1..8683 at sf0.01 exercise BOTH the raw-estimate and the
    // linear-counting correction paths).
    "q154_hll_distinct" -> ((s, d) =>
      SketchOps.hllDistinct(
          Tables.events(s, d).select(
            floor(col("value") / 100.0).cast("long").as("vb"),
            col("event_id")),
          "vb", "event_id", p = 8)
        .orderBy("vb")),

    // L106 — SCD2 dimension build: per-user event_type change history
    // with valid_from/valid_to (epoch micros) and is_current.
    "q155_scd2" -> ((s, d) =>
      RelationalOps.scd2(
          Tables.events(s, d)
            .withColumn("ts_us", unix_micros(col("ts"))),
          "user_id", "event_type", "ts_us", "event_id")
        .orderBy("user_id", "valid_from")),

    // L107 — first/last-touch attribution: credits per channel over
    // the touches preceding each user's first purchase.
    "q156_attribution" -> ((s, d) =>
      MetricOps.attribution(
          Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts"))),
          "user_id", "ts_us", "event_id", "event_type", "purchase")
        .orderBy("channel")),

    // L109 — empirical-CDF (percentile-rank) lookup table over the
    // value column (rank normalization; histogram + range-partitioned
    // cumsum — no single-partition window at any cardinality).
    "q158_ecdf" -> ((s, d) =>
      EncodeOps.ecdfTable(Tables.events(s, d), "value")
        .orderBy("v")),

    // L110 — deterministic grouped k-fold assignment + fold balance
    // audit (md5 fold of the user key; leakage-safe CV split).
    "q159_kfold_balance" -> ((s, d) =>
      SamplingOps.kFoldBalance(
          Tables.events(s, d).withColumn("label",
            when(col("value") > 100, 1).otherwise(0)),
          "user_id", "label", k = 5)
        .orderBy("fold")),

    // L111 — product quantization: 64-dim embeddings → 8 sub-codes
    // from a 16-codeword codebook (seed vectors vec_id < 16) +
    // reconstruction error.
    "q160_product_quantize" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.productQuantize(emb,
          emb.filter(col("vec_id") < 16), "vec_id", "embedding",
          m = 8, subDim = 8)
        .orderBy("vec_id")
    }),

    // L112 — deterministic 2-step bipartite random walk (DeepWalk-
    // style positive-pair sampling over the customer↔part co-purchase
    // graph; md5 step choice = reproducible walks).
    "q161_random_walk" -> ((s, d) => {
      val cp = Tables.orders(s, d)
        .join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("l_partkey").as("part"), col("o_custkey").as("cust"))
      GraphOps.bipartiteWalk(cp, "part", "cust",
          cp.filter(col("part") < 100), walksPerStart = 2)
        .orderBy("start_node", "walk_id")
    }),

    // L113 — CMS join-cardinality estimate: sketch inner product vs
    // the exact size, fact tables never joined.
    "q162_join_size_estimate" -> ((s, d) =>
      SketchOps.joinSizeEstimate(
        Tables.orders(s, d), "o_custkey",
        Tables.customer(s, d), "c_custkey")),

    // L114 — HITS authorities over the supplier→part supply graph
    // (2 max-normalized iterations, DECIMAL-exact sums).
    "q163_hits" -> ((s, d) =>
      GraphOps.hits(Tables.lineitem(s, d), "l_suppkey", "l_partkey")
        .orderBy(col("authority").desc, col("node"))),

    // L115 — per-source boilerplate 3-gram signal (C4-style chrome
    // detection: grams shared by ≥2 docs of one source).
    "q164_boilerplate" -> ((s, d) =>
      TextOps.boilerplateGrams(Tables.documents(s, d), "doc_id", "text",
          "source", n = 3, minDocs = 2)
        .orderBy("doc_id")),

    // L116 — Zipf-law fit of the corpus unigram distribution (OLS of
    // ln freq on ln rank; DECIMAL-exact moment sums).
    "q165_zipf_fit" -> ((s, d) =>
      TextOps.zipfFit(Tables.documents(s, d), "text")),

    // L117 — partition checksum diff: which event_type partitions
    // drifted after dropping high-value clicks (order-independent
    // md5-sum checksums; only drifted partitions emitted).
    "q166_partition_checksum" -> ((s, d) => {
      val old = Tables.events(s, d)
      val neu = old.filter(!(col("event_type") === "click" &&
        col("value") > 400))
      RelationalOps.partitionChecksumDiff(old, neu, "event_type",
          Seq("user_id", "event_type"))
        .orderBy("event_type")
    }),

    // L118 — Benford first-digit audit over the value column
    // (string-of-scaled-integer digits — no libm log10 flip risk).
    "q167_benford" -> ((s, d) =>
      QualityChecks.benfordAudit(Tables.events(s, d), "value", scale = 2)
        .orderBy("digit")),

    // L119 — edit-distance-1 pair mining via SymSpell deletion
    // neighborhoods + exact levenshtein verify (customer names).
    "q168_typo_pairs" -> ((s, d) =>
      TextOps.typoPairs(Tables.customer(s, d), "c_name")
        .orderBy("t1", "t2")),

    // L120 — referential-integrity audit: orphan counts per declared
    // FK relationship (second one against a truncated parent to show
    // detection).
    "q169_ri_audit" -> ((s, d) =>
      QualityChecks.riAudit(Seq(
          ("lineitem.l_orderkey->orders",
            Tables.lineitem(s, d), "l_orderkey",
            Tables.orders(s, d), "o_orderkey"),
          ("orders.o_custkey->customer10",
            Tables.orders(s, d), "o_custkey",
            Tables.customer(s, d).filter(col("c_custkey") >= 10),
            "c_custkey")))
        .orderBy("relationship")),

    // L121 — curation pipeline v2: boilerplate gate + substring-dedup
    // gate + sequence packing of the survivors, one lazy plan — the
    // round-7 signals composed end-to-end.
    "q170_curation_v2" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val boilerOk = TextOps.boilerplateGrams(docs, "doc_id", "text",
          "source", n = 3, minDocs = 2)
        .filter(col("boiler_frac") <= 0.03).select("doc_id")
      val spanOk = TextOps.dupSpanStats(docs, "doc_id", "text", n = 5)
        .filter(col("dup_frac") <= 0.5).select("doc_id")
      val kept = docs.join(boilerOk, "doc_id").join(spanOk, "doc_id")
      TextOps.packSequences(kept, "source", "doc_id", "text", 2048L)
        .orderBy("source", "bin")
    }),

    // L122 — Theil-Sen robust trend of monthly order volume per
    // priority; the pairwise stage runs on the aggregated month series
    // (bounded by the calendar, not the row count).
    "q171_theil_sen" -> ((s, d) => {
      val monthly = Tables.orders(s, d)
        .groupBy(col("o_orderpriority"),
          months_between(date_trunc("month", col("o_orderdate")),
            lit("1992-01-01").cast("timestamp")).cast("long").as("mi"))
        .agg(count(lit(1)).cast("double").as("n"))
      MetricOps.theilSen(monthly, "o_orderpriority", "mi", "n")
        .orderBy("o_orderpriority")
    }),

    // L123 — OLS trend (regr_slope/intercept/r2) of event value vs
    // days-since-epoch per type; one-pass co-moment aggregation.
    "q172_regr_trend" -> ((s, d) =>
      MetricOps.olsTrend(
          Tables.events(s, d).withColumn("day",
            datediff(col("ts"), lit("1970-01-01").cast("date"))
              .cast("double")),
          "event_type", "day", "value")
        .orderBy("event_type")),

    // L124 — first-order Markov transition matrix over per-user event
    // streams (behavioral-model audit; per-entity windows only).
    "q173_markov_transitions" -> ((s, d) =>
      GraphOps.markovTransitions(Tables.events(s, d), "user_id", "ts",
          "event_id", "event_type")
        .orderBy("src", "dst")),

    // L125 — Tukey-fence outlier audit on event values per type
    // (6-dp-snapped exact quartiles so both engines fence identically).
    "q174_tukey_outliers" -> ((s, d) =>
      MetricOps.tukeyOutliers(Tables.events(s, d), "event_type", "value")
        .orderBy("event_type")),

    // L126 — CUSUM change-point audit of daily mean event value per
    // type (Page's test via the cumsum − running-min closed form; the
    // windows run on the calendar-bounded daily series).
    "q175_cusum" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
            .cast("long").as("day"))
        .agg(round(avg(col("value")), 6).as("m"))
      MetricOps.changePointCusum(daily, "event_type", "day", "m")
        .orderBy("event_type")
    }),

    // L127 — Pareto frontier of per-customer (order count, exact spend):
    // the distributed skyline sweep (range-partitioned prefix max).
    "q176_pareto_frontier" -> ((s, d) => {
      val pts = Tables.orders(s, d).groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
      RelationalOps.skyline2D(pts, "n_orders", "spend")
        .withColumn("spend", col("spend").cast("double"))
        .orderBy(col("n_orders").desc)
    }),

    // L128 — pairwise association rules over order baskets (support /
    // directional confidence / lift; apriori-pruned before the
    // per-basket pair self-join).
    "q177_assoc_rules" -> ((s, d) =>
      MetricOps.assocRules(Tables.lineitem(s, d), "l_orderkey", "l_partkey",
          minCo = 2)
        .orderBy("ant", "cons")),

    // L129 — per-user inter-arrival burstiness (Goh–Barabási
    // (σ−μ)/(σ+μ) + CV over exact-microsecond gaps; one lag window).
    "q178_interarrival" -> ((s, d) =>
      MetricOps.interArrival(Tables.events(s, d), "user_id", "ts",
          minEvents = 5)
        .orderBy("user_id")),

    // L130 — rolling-baseline anomaly flags on the daily mean event
    // value per type (trailing-7 z-score, baseline never includes the
    // current bucket).
    "q179_rolling_anomaly" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
            .cast("long").as("day"))
        .agg(round(avg(col("value")), 6).as("m"))
      MetricOps.rollingAnomaly(daily, "event_type", "day", "m")
        .orderBy("event_type", "day")
    }),

    // L131 — blocked entity-resolution join: Jaro–Winkler ≥ 0.8
    // between part names sharing (brand, size), on the codegen'd
    // graft_jw expression.
    "q180_jaro_winkler" -> ((s, d) =>
      TextOps.fuzzyBlockJoin(Tables.part(s, d), Seq("p_brand", "p_size"),
          "p_name", minSim = 0.8)
        .orderBy("p_brand", "p_size", "name_a", "name_b")),

    // L132 — lag-1 autocorrelation of the daily event count per type
    // (calendar self-join, gap-safe; corr rounded like q68).
    "q181_autocorr" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
            .cast("long").as("day"))
        .agg(count(lit(1)).cast("double").as("n"))
      MetricOps.autocorr(daily, "event_type", "day", "n", lagK = 1,
          roundTo = 4)
        .orderBy("event_type")
    }),

    // L133 — rank-biased overlap (p=0.9, k=10) between each nation's
    // top-10 parts by revenue and the global top-10 (assortment-drift
    // audit; k²-bounded depth spine, never data-sized).
    "q182_rbo" -> ((s, d) => {
      // Both ranking branches consume the 3-way revenue join; Spark's
      // ReuseExchange dedups the shared agg subplan (verified — pinning
      // it bought nothing), so no checkpoint here.
      val rev = Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("l_partkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).as("r"))
      val wN = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("r").desc, col("l_partkey"))
      val natTop = rev.withColumn("rk", row_number().over(wN))
        .filter(col("rk") <= 10)
        .select(col("c_nationkey"), col("l_partkey"), col("rk"))
      // Global ranking: aggregate (|parts| rows), then TakeOrdered — the
      // unpartitioned window runs over only the 10 surviving rows.
      val glob = rev.groupBy(col("l_partkey")).agg(sum(col("r")).as("g"))
        .orderBy(col("g").desc, col("l_partkey")).limit(10)
        .withColumn("rk",
          row_number().over(Window.orderBy(col("g").desc, col("l_partkey"))))
        .select(col("l_partkey"), col("rk"))
      val globPerNation = natTop.select(col("c_nationkey")).distinct()
        .crossJoin(broadcast(glob))
      MetricOps.rbo(natTop, globPerNation, "c_nationkey", "l_partkey",
          rankCol = "rk", k = 10, p = 0.9)
        .orderBy("c_nationkey")
    }),

    // L134 — Kaplan–Meier survival with right censoring: days from a
    // user's first event to first purchase, censored at last activity
    // (duration histogram + two rangeCumSum passes; decimal ln-sums).
    "q183_kaplan_meier" -> ((s, d) => {
      val subj = Tables.events(s, d).groupBy(col("user_id"))
        .agg(min(col("ts")).as("__t0"),
          min(when(col("event_type") === "purchase", col("ts"))).as("__tp"),
          max(col("ts")).as("__tmax"))
        .select(datediff(coalesce(col("__tp"), col("__tmax")).cast("date"),
            col("__t0").cast("date")).cast("long").as("dur"),
          when(col("__tp").isNotNull, 1).otherwise(0).as("ev"))
      MetricOps.kaplanMeier(subj, "dur", "ev").orderBy("t")
    }),

    // L135 — 1-D Wasserstein (earth-mover) drift between click and
    // view value distributions (exact-integer ECDF gap over the
    // quantized support histogram).
    "q184_wasserstein" -> ((s, d) =>
      MetricOps.wasserstein1D(Tables.events(s, d), "value", "event_type",
        "click", "view")),

    // L136 — degree assortativity of the customer–supplier bipartite
    // graph induced by orders (hub-hub vs hub-leaf mixing, one corr
    // over the deduplicated edge list).
    "q185_assortativity" -> ((s, d) => {
      val e = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("l_suppkey"))
      GraphOps.degreeAssortativity(e, "o_custkey", "l_suppkey")
    }),

    // L137 — chi-square independence + Cramér's V for event_type ×
    // value bucket (categorical drift companion to KS/PSI/W₁).
    "q186_chi_square" -> ((s, d) =>
      MetricOps.chiSquare(Tables.events(s, d)
        .withColumn("bucket",
          when(col("value") > 100, "high").otherwise("low")),
        "event_type", "bucket")),

    // L138 — Mann–Whitney U rank-sum drift test, click vs view value
    // (nonparametric twin of q184's W₁: same bounded-histogram +
    // rangeCumSum rank machinery, rank units instead of value units).
    "q187_mann_whitney" -> ((s, d) =>
      MetricOps.mannWhitney(Tables.events(s, d), "value", "event_type",
        "click", "view")),

    // L139 — winsorized per-segment account-balance stats (p05/p95
    // clip; robust-vs-raw mean and the clipped sample stddev from
    // exact decimal moments).
    "q188_winsorize" -> ((s, d) =>
      EncodeOps.winsorizedStats(Tables.customer(s, d), "c_mktsegment",
          "c_acctbal")
        .orderBy("c_mktsegment")),

    // L140 — Benjamini–Hochberg FDR over 35 simultaneous Welch tests
    // (each event_type × day-of-week mean value vs the rest of its
    // type; exact decimal moments → z → logistic-approx two-sided p →
    // distributed BH rank/threshold).
    "q189_bh_fdr" -> ((s, d) => {
      val e = Tables.events(s, d)
        .withColumn("dw", dayofweek(col("ts")))
        .withColumn("__v", round(col("value").cast("double"), 4)
          .cast("decimal(18,4)"))
      val cell = e.groupBy(col("event_type"), col("dw"))
        .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"),
          sum(col("__v") * col("__v")).as("__ss"))
      val tot = cell.groupBy(col("event_type"))
        .agg(sum(col("__n")).as("__tn"), sum(col("__s")).as("__ts"),
          sum(col("__ss")).as("__tss"))
      val tests = cell.join(broadcast(tot), "event_type")
        .withColumn("__nr", col("__tn") - col("__n"))
        .filter(col("__n") > 1 && col("__nr") > 1)
        .withColumn("__md", col("__s").cast("double") / col("__n"))
        .withColumn("__mr",
          (col("__ts") - col("__s")).cast("double") / col("__nr"))
        .withColumn("__vd", (col("__ss").cast("double") -
          col("__n") * col("__md") * col("__md")) / (col("__n") - 1))
        .withColumn("__vr", ((col("__tss") - col("__ss")).cast("double") -
          col("__nr") * col("__mr") * col("__mr")) / (col("__nr") - 1))
        .withColumn("__den",
          sqrt(col("__vd") / col("__n") + col("__vr") / col("__nr")))
        .withColumn("z", when(col("__den") > 0,
          round((col("__md") - col("__mr")) / col("__den"), 6)))
        // logistic approximation of the two-sided normal p-value
        // (Φ(z) ≈ 1/(1+e^{−1.702z}) — engine-portable closed form,
        // no erf in either engine's SQL surface)
        .withColumn("p", round(lit(2.0) /
          (lit(1.0) + exp(lit(1.702) * abs(col("z")))), 6))
        .withColumn("test_id",
          concat(col("event_type"), lit("#"), col("dw").cast("string")))
      MetricOps.bhFdr(tests.select("test_id", "p"), "test_id", "p",
          alpha = 0.1)
        .select("test_id", "p", "r", "crit", "is_reject")
        .orderBy("test_id")
    }),

    // L141 — Mann–Kendall monotone-trend test on the monthly order
    // count per priority (nonparametric twin of q171's Theil–Sen —
    // same bounded-series pair-join contract, S/z instead of the
    // median slope).
    "q190_mann_kendall" -> ((s, d) => {
      val monthly = Tables.orders(s, d)
        .groupBy(col("o_orderpriority"),
          months_between(date_trunc("month", col("o_orderdate")),
            lit("1992-01-01").cast("timestamp")).cast("long").as("mi"))
        .agg(count(lit(1)).cast("double").as("cnt"))
      MetricOps.mannKendall(monthly, "o_orderpriority", "mi", "cnt")
        .orderBy("o_orderpriority")
    }),

    // (q191 exact mutual-kNN demoted to a unit fixture in round 9 —
    // Round7OpsSpec/Round19OpsSpec cover the exact form and its
    // subset relation to the bucketed twin; q329 is the declared
    // ANN-driven scale twin.)

    // L143 — per-doc n-gram novelty (fraction of distinct 3-grams with
    // global df = 1 — the inverse of q164's boilerplate signal).
    "q192_ngram_novelty" -> ((s, d) =>
      TextOps.ngramNovelty(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // L144 — day-of-week seasonal effect per event type: centered
    // 7-point moving-average trend on the daily series, mean residual
    // per (type, dow) — STL-lite over the calendar-bounded aggregate.
    "q193_seasonal_dow" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .withColumn("day", datediff(col("ts").cast("date"),
          lit("1970-01-01").cast("date")).cast("long"))
        .withColumn("dow", dayofweek(col("ts").cast("date")))
        .groupBy(col("event_type"), col("day"), col("dow"))
        .agg(sum(round(col("value").cast("double"), 4)
          .cast("decimal(18,4)")).cast("double").as("daily"))
      MetricOps.seasonalEffect(daily, "event_type", "day", "dow", "daily")
        .orderBy("event_type", "dow")
    }),

    // (q194 label propagation over the EXACT mutual-kNN graph demoted
    // to a unit fixture in round 9 — Round19OpsSpec covers the
    // composition; q330 is the declared ANN-driven scale twin.)

    // L146 — KMV set algebra: Jaccard + intersection estimates between
    // click and view user sets from bottom-64 sketches, next to the
    // exact values (the kmvDistinct calibration discipline).
    "q195_kmv_jaccard" -> ((s, d) =>
      SketchOps.kmvJaccard(Tables.events(s, d), "event_type",
        "click", "view", "user_id", 64)),

    // L147 — SAX symbolization of each event type's daily-value
    // series: 8 equal-count PAA segments, 4-letter alphabet by the
    // type's own quartiles.
    "q196_sax" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .withColumn("day", datediff(col("ts").cast("date"),
          lit("1970-01-01").cast("date")).cast("long"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(round(col("value").cast("double"), 4)
          .cast("decimal(18,4)")).cast("double").as("daily"))
      MetricOps.saxSymbols(daily, "event_type", "day", "daily")
        .orderBy("event_type")
    }),

    // L148 — one-way ANOVA across the five event types' value
    // distributions: does mean value differ by type (F + η² effect
    // size, one moment pass).
    "q197_anova_f" -> ((s, d) =>
      MetricOps.anovaF(Tables.events(s, d), "event_type", "value")),

    // L149 — Kruskal–Wallis: the rank-based twin of q197 on the same
    // pool (no normality assumption; histogram ranks, no raw sort).
    "q198_kruskal_wallis" -> ((s, d) =>
      MetricOps.kruskalWallis(Tables.events(s, d), "event_type",
        "value")),

    // L150 — Brown–Forsythe: do the event types' value SPREADS
    // differ (median-centered Levene; precondition for pooled tests).
    "q199_brown_forsythe" -> ((s, d) =>
      MetricOps.brownForsythe(Tables.events(s, d), "event_type",
        "value")),

    // L151 — per-type Jarque–Bera normality screen (skew, kurtosis,
    // JB) over event values.
    "q200_jarque_bera" -> ((s, d) =>
      MetricOps.jarqueBera(Tables.events(s, d), "event_type",
        "value")),

    // L152 — log-rank test: do even- and odd-id users reach their
    // first purchase on the same survival curve (q183's subjects,
    // split by id parity)?
    "q201_logrank" -> ((s, d) => {
      val subj = Tables.events(s, d).groupBy(col("user_id"))
        .agg(min(col("ts")).as("__t0"),
          min(when(col("event_type") === "purchase", col("ts"))).as("__tp"),
          max(col("ts")).as("__tmax"))
        .select(datediff(coalesce(col("__tp"), col("__tmax")).cast("date"),
            col("__t0").cast("date")).cast("long").as("dur"),
          when(col("__tp").isNotNull, 1).otherwise(0).as("ev"),
          (col("user_id") % 2).cast("int").as("side"))
      MetricOps.logRank(subj, "dur", "ev", "side", 0, 1)
    }),

    // L153 — Pettitt change point on each event type's daily-sum
    // series: where does the level shift, and is the shift
    // significant?
    "q202_pettitt" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .withColumn("day", datediff(col("ts").cast("date"),
          lit("1970-01-01").cast("date")).cast("long"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(round(col("value").cast("double"), 4)
          .cast("decimal(18,4)")).cast("double").as("daily"))
      MetricOps.pettitt(daily, "event_type", "day", "daily")
        .orderBy("event_type")
    }),

    // L154 — user-participation diversity per event type: richness,
    // Simpson/inverse-Simpson, Shannon, Hill N₁ (the concentration
    // dual of q157's Gini).
    "q203_diversity" -> ((s, d) =>
      MetricOps.diversity(Tables.events(s, d), "event_type",
        "user_id")),

    // L155 — Grubbs most-extreme-value screen on account balances per
    // market segment (parametric companion to q174's Tukey fences).
    "q204_grubbs" -> ((s, d) =>
      MetricOps.grubbs(Tables.customer(s, d), "c_mktsegment",
        "c_acctbal")),

    // OLAP — TPC-H Q2 shape (minimum-cost supplier): the correlated
    // scalar-min subquery becomes a per-part min agg joined back on
    // (part, cost); the partsupp analogue is the observed
    // (part, supplier) pair table with cost = min unit price shipped.
    // All dims broadcast; the pair agg is the only fact shuffle.
    "q205_tpch_q2" -> ((s, d) => {
      val eligSupp = broadcast(Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name")))
      val eligPart = broadcast(Tables.part(s, d)
        .filter(col("p_size") === 3 && col("p_type") === "STANDARD")
        .select(col("p_partkey")))
      val pairs = Tables.lineitem(s, d)
        .join(eligPart, col("l_partkey") === col("p_partkey"))
        .join(eligSupp, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(round(col("l_extendedprice") / col("l_quantity"), 4))
          .as("cost"))
        .localCheckpoint(false) // feeds the min agg AND the equi-join back
      val minCost = pairs.groupBy(col("l_partkey").as("__mk"))
        .agg(min(col("cost")).as("__mc"))
      pairs
        .join(minCost, col("l_partkey") === col("__mk") &&
          col("cost") === col("__mc"))
        .join(eligSupp, col("l_suppkey") === col("s_suppkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("l_partkey").as("p_partkey"), col("cost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // OLAP — TPC-H Q9 shape (product-type profit by nation × year):
    // profit = revenue − 0.6·retailprice·qty (the supplycost
    // analogue), summed as exact decimals. Part/supplier/nation
    // broadcast; the one wide exchange is lineitem ⋈ orders on
    // orderkey.
    "q206_tpch_q9" -> ((s, d) => {
      val rev = expr(
        "CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))")
      val cost = expr(
        "CAST(round(p_retailprice * 0.6, 4) AS DECIMAL(18,4)) * CAST(l_quantity AS BIGINT)")
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
            .filter(col("p_name").like("%gear%"))
            .select(col("p_partkey"), col("p_retailprice"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"),
          (rev - cost).as("__amount"))
        .groupBy(col("nation"), col("o_year"))
        .agg(sum(col("__amount")).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // OLAP — TPC-H Q11 shape (important stock values): per
    // (nation, part) shipped value vs a scalar fraction of the global
    // total — the HAVING-subquery compares in multiply form against a
    // broadcast 1-row total (no engine division).
    "q207_tpch_q11" -> ((s, d) => {
      val rev = expr(
        "CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))")
      val vals = Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("l_partkey"))
        .agg(sum(rev).as("__v"))
        .localCheckpoint(false) // feeds the scalar total AND the filter
      val tot = vals.agg(sum(col("__v")).as("__tot"))
      vals.crossJoin(broadcast(tot))
        .filter(col("__v") * 10000 > col("__tot"))
        .select(col("n_name"), col("l_partkey"),
          col("__v").cast("double").as("value"))
        .orderBy(col("value").desc, col("n_name"), col("l_partkey"))
    }),

    // OLAP — TPC-H Q16 shape (supplier count by part attribute): the
    // NOT-IN complaint subquery is an anti join; the partsupp
    // analogue is the distinct observed (part, supplier) pair; count
    // is distinct suppliers per attribute triple.
    "q208_tpch_q16" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .join(broadcast(Tables.part(s, d)
            .filter(col("p_brand") =!= "Brand#1" &&
              !col("p_type").like("SMALL%") &&
              col("p_size").isin(1, 2, 3, 4, 5))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, d)
            .filter(col("s_acctbal") < 0).select(col("s_suppkey"))),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"),
          col("p_type"), col("p_size"))
    }),

    // OLAP — TPC-H Q20 shape (excess-stock suppliers): the nested
    // EXISTS chain becomes pair-level aggregation (1996 quantity vs
    // HALF the all-time quantity, compared 2q > t in integer form) →
    // semi join up to suppliers of one nation.
    "q209_tpch_q20" -> ((s, d) => {
      val excess = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
            .filter(col("p_name").like("small%"))
            .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("long")).as("__qt"),
          sum(when(year(col("l_shipdate")) === 1996,
            col("l_quantity").cast("long")).otherwise(0L)).as("__qy"))
        .filter(col("__qy") * 2 > col("__qt"))
        .select(col("l_suppkey")).distinct()
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
            .filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), round(col("s_acctbal"), 2).as("s_acctbal"))
        .orderBy(col("s_name"))
    }),

    // L156 — WOE / information value of event_type against the click
    // label (categorical feature screening; credit-scoring staple).
    "q210_woe_iv" -> ((s, d) =>
      MetricOps.woeIv(labeled(s, d), "event_type", "label")),

    // L157 — average precision (PR-AUC step form) of an
    // activity-count ranker for purchase propensity, per parity
    // cohort: tie-robust by construction (distinct scores step once).
    "q211_avg_precision" -> ((s, d) => {
      val peruser = Tables.events(s, d).groupBy(col("user_id"))
        .agg(count(lit(1)).as("score"),
          max(when(col("event_type") === "purchase", 1).otherwise(0))
            .as("label"))
        .withColumn("cohort", col("user_id") % 2)
      MetricOps.averagePrecision(peruser, "cohort", "score", "label")
    }),

    // L158 — k-anonymity / l-diversity release audit: customers keyed
    // by the (nation, segment) quasi-identifier, balance sign as the
    // sensitive attribute, k = 5.
    "q212_k_anonymity" -> ((s, d) =>
      QualityChecks.kAnonymity(
        Tables.customer(s, d)
          .withColumn("bal_sign", when(col("c_acctbal") >= 0, 1).otherwise(0)),
        Seq("c_nationkey", "c_mktsegment"), "bal_sign", k = 5)),

    // L159 — local clustering coefficient per supplier over the q135
    // co-order graph: the per-node refinement of the triangle census
    // (same degree-oriented O(E^1.5) wedge join).
    "q213_local_clustering" -> ((s, d) => {
      val edges = Tables.lineitem(s, d).alias("l1")
        .join(Tables.lineitem(s, d).alias("l2"),
          col("l1.l_orderkey") === col("l2.l_orderkey") &&
            col("l1.l_suppkey") < col("l2.l_suppkey"))
        .select(col("l1.l_suppkey").as("sa"), col("l2.l_suppkey").as("sb"))
        .filter((col("sa") * 31 + col("sb")) % 20 === 0)
      GraphOps.localClustering(edges, "sa", "sb")
    }),

    // L160 — Wilcoxon signed-rank on paired per-user values: first vs
    // last event value (did within-user value drift?), the paired
    // companion to q187's Mann–Whitney.
    "q214_wilcoxon" -> ((s, d) => {
      val paired = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(min_by(col("value"), struct(col("ts"), col("event_id")))
            .as("first_v"),
          max_by(col("value"), struct(col("ts"), col("event_id")))
            .as("last_v"),
          count(lit(1)).as("__n"))
        .filter(col("__n") >= 2)
      MetricOps.wilcoxonSignedRank(paired, "first_v", "last_v")
    }),

    // L161 — leave-one-group-out jackknife SE for the overall click
    // rate, groups = day-of-week: deterministic resampling-free error
    // bars on a ratio-of-sums metric.
    "q215_jackknife" -> ((s, d) =>
      MetricOps.jackknifeRatio(
        labeled(s, d).withColumn("dow", dayofweek(col("ts")))
          .withColumn("one", lit(1L)), // den = 1 per event → θ is a rate
        "dow", "label", "one")),

    // L162 — per-key skew profile of the events join key: the advisor
    // a 100 TB shuffle consults before choosing salting vs AQE hints.
    "q216_key_skew" -> ((s, d) =>
      MetricOps.keySkewProfile(Tables.events(s, d), "user_id")),

    // L163 — Cliff's delta + Cohen's d between parity cohorts on event
    // value: the effect-size readout that accompanies a significant
    // rank test.
    "q217_effect_sizes" -> ((s, d) =>
      MetricOps.effectSizes(
        Tables.events(s, d).withColumn("cohort", col("user_id") % 2),
        "value", "cohort", 0L, 1L)),

    // (q218 rec-list metrics over the EXACT top-5 lists demoted to a
    // unit fixture in round 9 — Round8OpsSpec covers recListMetrics;
    // q331 is the declared ANN-driven scale twin.)

    // L165 — TextRank keyword ranking: deterministic PageRank over the
    // adjacent-token co-occurrence graph (undirected), top 30 tokens.
    "q219_textrank" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .toDF("doc_id", "i", "tok")
      val w = Window.partitionBy("doc_id").orderBy("i")
      val bi = toks.withColumn("nxt", lead(col("tok"), 1).over(w))
        .filter(col("nxt").isNotNull && col("tok") =!= col("nxt"))
        .select(least(col("tok"), col("nxt")).as("a"),
          greatest(col("tok"), col("nxt")).as("b"))
        .distinct()
      val edges = bi.unionAll(bi.select(col("b").as("a"), col("a").as("b")))
      val nodes = toks.select(col("tok")).distinct()
      GraphOps.pageRankPortable(nodes, "tok", edges, "a", "b", 3)
        .select(col("node").as("token"), col("rank"))
        .orderBy(col("rank").desc, col("token")).limit(30)
    }),

    // L166 — McNemar paired marginal test: within-user, does clicking
    // co-move with purchasing? Only the discordant users matter.
    "q220_mcnemar" -> ((s, d) =>
      MetricOps.mcnemar(
        Tables.events(s, d).groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "click", 1).otherwise(0))
              .as("has_click"),
            max(when(col("event_type") === "purchase", 1).otherwise(0))
              .as("has_purchase")),
        "has_click", "has_purchase")),

    // L167 — Flesch reading ease per document (vowel-run syllable
    // approximation; map-only, codegen'd).
    "q221_readability" -> ((s, d) =>
      TextOps.readability(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // L168 — Hilbert clustering key on the (custkey-mod, balance-bin)
    // grid: the seamless layout key (q116's Z-order is the Morton
    // twin); map-only integer bit walk.
    "q222_hilbert_layout" -> ((s, d) =>
      LayoutOps.hilbertKey(
          Tables.customer(s, d)
            .withColumn("x", col("c_custkey") % 256)
            .withColumn("y",
              ((floor(col("c_acctbal")).cast("long") % 256) + 256) % 256),
          "x", "y", 8, "hkey")
        .select(col("c_custkey"), col("x"), col("y"), col("hkey"))
        .orderBy("hkey", "c_custkey")),

    // L169 — file-skipping simulator: natural vs Z-order vs Hilbert
    // layout of customer, zone-map prune fraction for a balance-bin
    // range predicate. The advisor a 100 TB OPTIMIZE consults first.
    "q223_prune_sim" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .withColumn("x", col("c_custkey") % 256)
        .withColumn("y",
          ((floor(col("c_acctbal")).cast("long") % 256) + 256) % 256)
      val withH = LayoutOps.hilbertKey(c, "x", "y", 8, "__hk")
      LayoutOps.pruneSimulation(withH,
        Seq("natural" -> col("c_custkey"),
          "zorder" -> LayoutOps.zValue(col("x"), col("y"), 8),
          "hilbert" -> col("__hk")),
        "c_custkey", "y", lo = 32, hi = 47, nFiles = 32)
        .orderBy("layout")
    }),

    // L170 — incremental aggregation: per-type value state from two
    // half-batches merged ≡ the full recompute (the oracle IS the full
    // aggregation — materialized-view maintenance, proven equal).
    "q224_incremental_agg" -> ((s, d) => {
      val e = Tables.events(s, d)
      val a = RelationalOps.aggState(
        e.filter(col("event_id") % 2 === 0), "event_type", "value")
      val b = RelationalOps.aggState(
        e.filter(col("event_id") % 2 === 1), "event_type", "value")
      RelationalOps.finalizeAggState(
        RelationalOps.mergeAggStates(Seq(a, b)), "event_type")
    }),

    // L171 — BPE merge-pair mining: top adjacent character pairs
    // weighted by word frequency, over the distinct vocabulary only.
    "q225_bpe_pairs" -> ((s, d) =>
      TextOps.bpePairs(Tables.documents(s, d), "text", 30)),

    // L172 — rendezvous-placement rebalance audit: md5 highest-random-
    // weight assignment of customers to 8 vs 9 workers; the moved
    // share should sit near the minimal 1/9 (mod-hashing moves ~8/9).
    "q226_rendezvous" -> ((s, d) => {
      val k = Tables.customer(s, d).select(col("c_custkey"))
      val a = LayoutOps.rendezvousAssign(k, "c_custkey", 8, "w8")
      val b = LayoutOps.rendezvousAssign(k, "c_custkey", 9, "w9")
      a.join(b, "c_custkey")
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("w8") =!= col("w9"), 1L).otherwise(0L)).as("moved"))
        .select(col("n_keys"), col("moved"),
          round(col("moved").cast("double") / col("n_keys"), 6)
            .as("moved_frac"))
    }),

    // L173 — "fightin' words": Dirichlet-prior log-odds z per token
    // between source halves (which vocabulary characterizes src0-9 vs
    // src10-19), top 30 side-A words.
    "q227_log_odds" -> ((s, d) =>
      TextOps.logOddsZ(
        Tables.documents(s, d).withColumn("side",
          when(substring(col("source"), 4, 10).cast("int") < 10, 0)
            .otherwise(1)),
        "text", "side", alpha = 0.01, topK = 30)),

    // L174 — Good–Turing unseen-mass estimate per source: P0 = N1/N
    // and smoothed r* for r ≤ 50 (corpus coverage dial).
    "q228_good_turing" -> ((s, d) =>
      TextOps.goodTuring(
        Tables.documents(s, d).filter(col("source").isin("src0", "src1")),
        "source", "text", maxR = 50)),

    // L175 — per-dimension embedding profile: mean/std/min/max per
    // coordinate — the vector-feature drift monitor.
    "q229_dim_profile" -> ((s, d) =>
      SimilarityOps.dimProfile(Tables.embeddings(s, d), "embedding")),

    // L176 — version-retention planner: keep newest 5 events per user
    // plus everything from Jan 20 on; how much is reclaimable?
    "q230_retention_plan" -> ((s, d) =>
      RelationalOps.retentionPlan(Tables.events(s, d), "user_id", "ts",
        "event_id", keepLast = 5,
        cutoff = to_timestamp(lit("2024-01-20 00:00:00")))),

    // L177 — small-file compaction planner over per-day event "files"
    // (bytes ≈ 128·rows): how many files fold into 128 KiB bins?
    "q231_compaction_plan" -> ((s, d) => {
      val files = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg((count(lit(1)) * 128).as("bytes"))
      LayoutOps.compactionPlan(files, "day", "bytes",
        targetBytes = 131072L)
    }),

    // L178 — watermark advisor: event-time lateness vs event_id
    // arrival order, integer-second percentiles; suggest the p99.
    "q232_watermark_advisor" -> ((s, d) =>
      MetricOps.watermarkAdvisor(Tables.events(s, d), "event_id", "ts")),

    // L179 — sequential A→B rules on first occurrences per user:
    // support/confidence/lift of "first a precedes first b".
    "q233_seq_rules" -> ((s, d) =>
      RelationalOps.seqRules(Tables.events(s, d), "user_id", "ts",
        "event_type")),

    // L180 — CUPED variance reduction: per-user second-half value
    // adjusted by the first-half covariate, arms = user parity.
    "q234_cuped" -> ((s, d) => {
      val mid = to_timestamp(lit("2024-01-16 00:00:00"))
      val u = Tables.events(s, d)
        .select(col("user_id"), col("ts"),
          round(col("value").cast("double"), 4).cast("decimal(18,4)")
            .as("v"))
        .groupBy(col("user_id"))
        .agg(sum(when(col("ts") < mid, col("v"))).as("sx"),
          count(when(col("ts") < mid, 1)).as("nx"),
          sum(when(col("ts") >= mid, col("v"))).as("sy"),
          count(when(col("ts") >= mid, 1)).as("ny"))
        .filter(col("nx") > 0 && col("ny") > 0)
        .select((col("user_id") % 2).as("arm"),
          (col("sx").cast("double") / col("nx")).as("x"),
          (col("sy").cast("double") / col("ny")).as("y"))
      ExperimentOps.cuped(u, "arm", "y", "x")
    }),

    // L181 — experiment guardrails: sample-ratio-mismatch χ² and the
    // minimal detectable effect on the click label, arms = user parity.
    "q235_srm_power" -> ((s, d) =>
      ExperimentOps.srmAndPower(
        labeled(s, d).withColumn("arm", col("user_id") % 2),
        "arm", "label")),

    // L182 — split conformal interval around the per-type mean
    // predictor: q̂ from the calibration half, coverage audited on the
    // held-out half (should sit at ~0.9).
    "q236_conformal" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_type"), (col("event_id") % 2).cast("int")
          .as("sp"), col("value"))
      val model = e.filter(col("sp") === 0)
        .groupBy(col("event_type"))
        .agg((sum(round(col("value").cast("double"), 4)
            .cast("decimal(18,4)")).cast("double") / count(lit(1)))
          .as("pred"))
      ExperimentOps.conformal(e.join(broadcast(model), "event_type"),
        "sp", "value", "pred", level = 0.9)
    }),

    // L183 — off-policy value of the "always recommend click" policy
    // from logged uniform-ish feedback: IPS / SNIPS / clipped IPS.
    "q237_offpolicy" -> ((s, d) =>
      ExperimentOps.offPolicyValue(labeled(s, d), "event_type", "label",
        targetAction = "click", clipAt = 10.0)),

    // L184 — expected calibration error of the per-type CTR predictor
    // (trained on the even half, audited on the odd half, 10 bins).
    "q238_ece" -> ((s, d) => {
      val e = labeled(s, d)
        .withColumn("sp", (col("event_id") % 2).cast("int"))
      val model = e.filter(col("sp") === 0)
        .groupBy(col("event_type"))
        .agg((sum(col("label")).cast("double") / count(lit(1)))
          .as("pred"))
      ExperimentOps.ece(
        e.filter(col("sp") === 1).join(broadcast(model), "event_type"),
        "pred", "label", nBins = 10)
    }),

    // L185 — delta-method relative-lift CI on the click label between
    // parity arms: the "+x% ± y%" experiment readout.
    "q239_lift_ci" -> ((s, d) =>
      ExperimentOps.liftCi(
        labeled(s, d).withColumn("arm", col("user_id") % 2),
        "arm", "label")),

    // L186 — order-value reconciliation: lineitem extendedprice sums
    // vs o_totalprice, relative-difference profile at 5% tolerance.
    "q240_reconciliation" -> ((s, d) =>
      QualityChecks.reconcile(Tables.orders(s, d), "o_orderkey",
        "o_totalprice", Tables.lineitem(s, d), "l_orderkey",
        "l_extendedprice", tolerance = 0.05)),

    // L187 — day-over-day volume anomaly screen per event type:
    // trailing-7-day baseline, |z| ≥ 2 tripwire.
    "q241_volume_anomaly" -> ((s, d) =>
      MetricOps.volumeAnomaly(Tables.events(s, d), "event_type", "ts",
        window = 7, zCut = 2.0)),

    // L188 — cross-source duplication matrix: MinHash candidate pairs
    // rolled up to (source, source) — the corpus-governance heat map.
    "q242_dup_matrix" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = DedupOps.minhashCandidates(DedupOps.minhashSignature(
        DedupOps.shingles(docs, "doc_id", "text"), "doc_id", 4, 2),
        "doc_id", 4, 2)
      val src = docs.select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("doc_a"),
          col("source").as("sa")), "doc_a")
        .join(src.select(col("doc_id").as("doc_b"),
          col("source").as("sb")), "doc_b")
        .select(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"))
        .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_pairs"))
        .orderBy("source_a", "source_b")
    }),

    // L189 — functional-dependency audit across candidate keys: the
    // profiling step behind key discovery and normalization.
    "q243_fd_audit" -> ((s, d) =>
      QualityChecks.fdAudit(Tables.customer(s, d), "customer",
          Seq("c_custkey" -> "c_mktsegment",
            "c_nationkey" -> "c_mktsegment"))
        .unionAll(QualityChecks.fdAudit(Tables.orders(s, d), "orders",
          Seq("o_orderkey" -> "o_custkey")))
        .unionAll(QualityChecks.fdAudit(Tables.lineitem(s, d), "lineitem",
          Seq("l_orderkey" -> "l_suppkey")))
        .orderBy("table_name", "determinant", "dependent")),

    // L190 — sketch-accuracy calibration: KMV and HLL distinct
    // estimates vs exact, per column — the QA report that says which
    // sketch to trust at which cardinality.
    "q244_sketch_accuracy" -> ((s, d) => {
      val e = Tables.events(s, d)
      Seq("event_id", "event_type", "user_id").map { c =>
        val tagged = e.select(lit(c).as("col_name"), col(c))
        SketchOps.kmvDistinct(tagged, "col_name", c, 64)
          .select(col("col_name"), col("exact_distinct"), col("kmv_est"),
            col("rel_err").as("kmv_rel_err"))
          .join(SketchOps.hllDistinct(tagged, "col_name", c, 8)
            .select(col("col_name"), col("hll_est"),
              col("rel_err").as("hll_rel_err")), "col_name")
      }.reduce(_ unionAll _).orderBy("col_name")
    }),

    // L191 — collocation mining: normalized PMI of adjacent token
    // pairs (≥ 20 occurrences), top 30.
    "q245_npmi" -> ((s, d) =>
      TextOps.npmiCollocations(Tables.documents(s, d), "text",
        minCount = 20L, topK = 30)),

    // L204 — lead–lag cross-correlation: do daily views predict daily
    // purchases (and at which lag)?
    "q258_ccf" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("day"))
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("views"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("purchases"))
      MetricOps.crossCorrelation(daily, "day", "views", "purchases",
          maxLag = 5)
        .orderBy("lag")
    }),

    // L205 — calendar-gap audit: missing ingest days per event type
    // between each type's first and last active day.
    "q259_calendar_gaps" -> ((s, d) =>
      QualityChecks.calendarGaps(Tables.events(s, d), "event_type", "ts")
        .orderBy("event_type")),

    // L206 — weekly value percentile bands per event type (exact
    // inverse-CDF picks off the quantized histogram, no raw-row sort).
    "q260_percentile_bands" -> ((s, d) =>
      MetricOps.percentileBands(
          Tables.events(s, d)
            .withColumn("wk",
              (datediff(to_date(col("ts")), lit("1970-01-01"))
                .cast("long") / 7L).cast("long")),
          Seq("event_type", "wk"), "value")
        .orderBy("event_type", "wk")),

    // L207 — Ljung–Box portmanteau: joint lag-1..5 serial correlation
    // of each event type's daily counts.
    "q261_ljung_box" -> ((s, d) =>
      MetricOps.ljungBox(
          Tables.events(s, d)
            .groupBy(col("event_type"),
              datediff(to_date(col("ts")), lit("1970-01-01")).as("day"))
            .agg(count(lit(1)).as("y")),
          "event_type", "day", "y", m = 5)
        .orderBy("event_type", "lag")),

    // L200 — truncated-EWMA (α=½, dyadic weights) forecast anomaly
    // screen on each event type's daily counts.
    "q254_ewma_anomaly" -> ((s, d) =>
      MetricOps.ewmaAnomaly(
          Tables.events(s, d)
            .groupBy(col("event_type"),
              datediff(to_date(col("ts")), lit("1970-01-01")).as("day"))
            .agg(count(lit(1)).as("y")),
          "event_type", "day", "y", win = 8, zCut = 1.5)
        .orderBy("event_type", "day")),

    // L201 — Friedman repeated-measures rank test: do the event types
    // differ in daily volume, with each day as its own control block?
    "q255_friedman" -> ((s, d) =>
      MetricOps.friedman(
          Tables.events(s, d)
            .groupBy(to_date(col("ts")).cast("string").as("day"),
              col("event_type"))
            .agg(count(lit(1)).as("y")),
          "day", "event_type", "y")
        .orderBy("event_type")),

    // L202 — deterministic 1-in-20 systematic audit sample of the
    // customer table (md5 total order, exact stride).
    "q256_systematic_sample" -> ((s, d) =>
      SamplingOps.systematicSample(Tables.customer(s, d), "c_custkey",
          every = 20)
        .select(col("c_custkey"), col("c_mktsegment"), col("sample_rank"))
        .orderBy("c_custkey")),

    // L203 — Theil T inequality decomposition of (user, event-type)
    // activity: how much volume concentration is within vs between
    // event types.
    "q257_theil" -> ((s, d) =>
      MetricOps.theilDecomposition(
          Tables.events(s, d).groupBy("user_id", "event_type")
            .agg(count(lit(1)).as("x")),
          "event_type", "x")
        .orderBy("event_type")),

    // L196 — per-user interval-union coverage: 5-minute activity
    // windows merged into segments; effective active seconds per user.
    "q250_interval_coverage" -> ((s, d) =>
      RelationalOps.intervalCoverage(Tables.events(s, d), "user_id",
          "ts", "event_id", durS = 300L)
        .orderBy("user_id")),

    // L197 — Adamic–Adar link prediction over the q135 supplier
    // co-order graph: top-30 unlinked pairs by shared-neighbor score.
    "q251_adamic_adar" -> ((s, d) => {
      val edges = Tables.lineitem(s, d).alias("l1")
        .join(Tables.lineitem(s, d).alias("l2"),
          col("l1.l_orderkey") === col("l2.l_orderkey") &&
            col("l1.l_suppkey") < col("l2.l_suppkey"))
        .select(col("l1.l_suppkey").as("sa"), col("l2.l_suppkey").as("sb"))
        .filter((col("sa") * 31 + col("sb")) % 20 === 0)
      GraphOps.adamicAdar(edges, "sa", "sb", topK = 30)
    }),

    // L198 — Durbin–Watson serial-correlation diagnostic on the OLS
    // residuals of each event type's daily-count trend.
    "q252_durbin_watson" -> ((s, d) =>
      MetricOps.durbinWatson(
          Tables.events(s, d)
            .groupBy(col("event_type"),
              datediff(to_date(col("ts")), lit("1970-01-01")).as("day"))
            .agg(count(lit(1)).as("y")),
          "event_type", "day", "y")
        .orderBy("event_type")),

    // L199 — Fisher's exact test per event type: is (even user id) ×
    // (value > 50) independent? Upper-tail hypergeometric p from the
    // decimal log-factorial table.
    "q253_fisher_exact" -> ((s, d) =>
      MetricOps.fisherExact(
          Tables.events(s, d)
            .withColumn("a", (col("user_id") % 2 === 0).cast("int"))
            .withColumn("b", (col("value") > 50).cast("int")),
          "event_type", "a", "b")
        .orderBy("event_type")),

    // L192 — survivorship / golden-record merge over the MinHash dup
    // clusters: canonical member by (n_chars, min doc_id), cluster
    // mode of lang — aggregate-only, no per-cluster member sort.
    "q246_survivorship" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val clusters = GraphOps.connectedComponents(
        docs.select("doc_id"), "doc_id",
        DedupOps.minhashCandidates(DedupOps.minhashSignature(
          DedupOps.shingles(docs, "doc_id", "text"), "doc_id", 4, 2),
          "doc_id", 4, 2), "doc_a", "doc_b")
        .select(col("node").as("doc_id"), col("label").as("cluster_id"))
      DedupOps.survivorship(
          docs.join(clusters, "doc_id"),
          "cluster_id", "doc_id", "n_chars", "lang")
        .select(col("cluster_id"), col("n_members"), col("total_size")
            .as("total_chars"),
          col("canonical_id").as("canonical_doc"),
          col("canonical_size").as("canonical_chars"),
          col("mode_attr").as("merged_lang"))
        .orderBy("cluster_id")
    }),

    // L193 — incremental join maintenance: the materialized base join
    // plus three |Δ|-proportional delta joins must equal the full
    // recompute (which is exactly what the oracle runs).
    "q247_incremental_join" -> ((s, d) => {
      val cut = "1999-01-01"
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_orderdate")
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o_orderkey"),
          col("l_extendedprice"), col("l_discount"), col("l_shipdate"))
      val (o0, dO) = (o.filter(col("o_orderdate") < lit(cut)),
        o.filter(col("o_orderdate") >= lit(cut)))
      val (l0, dL) = (l.filter(col("l_shipdate") < lit(cut)),
        l.filter(col("l_shipdate") >= lit(cut)))
      // the "stored" materialization: pinned once, streamed not rebuilt
      val base = o0.join(l0, "o_orderkey").localCheckpoint(true)
      JoinOps.incrementalJoin(base, o0, dO, l0, dL, Seq("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          sum(expr("CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))"))
            .cast("double").as("revenue"))
        .orderBy("o_orderstatus")
    }),

    // L194 — UCB1 bandit index per event-type arm from the logged
    // reward stream (deterministic exploration bonus, ranked output).
    "q248_ucb1" -> ((s, d) =>
      ExperimentOps.ucb1(Tables.events(s, d), "event_type", "value")
        .orderBy(col("ucb_score").desc, col("arm"))),

    // L195 — Kendall τ-b per returnflag between quantity and discount:
    // joint-histogram pair counts (|cells|² ≤ 550², never n²).
    "q249_kendall_tau" -> ((s, d) =>
      MetricOps.kendallTau(Tables.lineitem(s, d), "l_returnflag",
          "l_quantity", "l_discount")
        .orderBy("l_returnflag")),

    // L108 — Gini concentration of per-user activity within each
    // event type (popularity-inequality audit; histogram-closed-form
    // Lorenz sum, no raw-key sort).
    "q157_gini" -> ((s, d) =>
      MetricOps.giniConcentration(Tables.events(s, d),
          "event_type", "user_id")
        .orderBy("event_type")),

    // S14/F7/J5/J6/O2/O3 — request parse → feature join → score → top-k →
    // response build (the online path, batch form).
    "q38_request_response" -> ((s, d) => {
      val requests = Tables.customer(s, d).filter(col("c_custkey") < 100)
        .select(concat(lit("{\"userid\": "), col("c_custkey").cast("string"),
          lit("}")).as("req_json"))
        .withColumn("user_id", get_json_object(col("req_json"), "$.userid").cast("long"))
      val clicks = labeled(s, d).filter(col("label") === 1)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      val cands = requests.crossJoin(
        s.range(1).select(explode(array(EVENT_TYPES.map(lit): _*)).as("event_type")))
      val w = Window.partitionBy("user_id").orderBy(col("score").desc, col("event_type"))
      cands.join(clicks, Seq("user_id", "event_type"), "left")
        .withColumn("score", coalesce(col("c"), lit(0L)))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("event_type"), col("score"), col("rn"),
          concat(lit("{\"userid\":"), col("user_id").cast("string"),
            lit(",\"itemid\":\""), col("event_type"),
            lit("\",\"score\":"), col("score").cast("string"), lit("}")).as("resp"))
        .orderBy("user_id", "rn")
    }),

    // L208 — Cochran's Q: are the k event types equally likely to
    // produce a high-value event for the same user (matched blocks)?
    "q262_cochran_q" -> ((s, d) =>
      MetricOps.cochranQ(
        Tables.events(s, d)
          .withColumn("x", (col("value") > 50).cast("int")),
        "user_id", "event_type", "x")),

    // L209 — Cochran–Armitage trend: does the F-status rate trend
    // across order months, per priority tier?
    "q263_cochran_armitage" -> ((s, d) =>
      MetricOps.cochranArmitage(
          Tables.orders(s, d)
            .withColumn("score", month(col("o_orderdate")))
            .withColumn("y", (col("o_orderstatus") === "F").cast("int")),
          "o_orderpriority", "score", "y")
        .orderBy("o_orderpriority")),

    // L210 — Wald–Wolfowitz runs test on each event type's daily
    // counts: do above/below-median days cluster into regimes?
    "q264_runs_test" -> ((s, d) =>
      MetricOps.runsTest(
          Tables.events(s, d)
            .groupBy(col("event_type"),
              datediff(to_date(col("ts")), lit("1970-01-01")).as("day"))
            .agg(count(lit(1)).as("y")),
          "event_type", "day", "y")
        .orderBy("event_type")),

    // L211 — exact 1-D energy distance between the view and purchase
    // value distributions (integer-exact pair sums off one histogram).
    "q265_energy_distance" -> ((s, d) =>
      MetricOps.energyDistance(Tables.events(s, d), "event_type",
        "value", "view", "purchase")),

    // L212 — Newman modularity of the label-propagation communities
    // over the mutual-kNN embedding graph. Driven by the BUCKETED
    // mutual-kNN edge list (the 100 TB composition — equi-joins only,
    // no cross join in the executed plan) at the COUNT-STEPPED
    // adaptive bucket width (the q436 schedule — Σ cell² stays bounded
    // as the corpus grows); the exact-crossJoin form is a unit fixture
    // in Round19OpsSpec.
    "q266_modularity" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val mk = SimilarityOps.mutualKnnBucketed(emb, "vec_id",
        "embedding", 5, SimilarityOps.adaptiveSignBits(emb))
      val seeds = emb.filter(col("vec_id") % 3 === 0)
        .select(col("vec_id"), col("label"))
      val communities = GraphOps.labelPropagate(mk, "id_a", "id_b",
        seeds, "vec_id", "label")
      GraphOps.modularity(mk, "id_a", "id_b", communities, "vec_id",
          "label_pred")
        .orderBy("community")
    }),

    // L213 — Neyman allocation: optimal vs proportional stratified-
    // sample budget split across market segments by acctbal spread.
    "q267_neyman_allocation" -> ((s, d) =>
      SamplingOps.neymanAllocation(Tables.customer(s, d),
          "c_mktsegment", "c_acctbal", 1000L)
        .orderBy("stratum")),

    // L214 — l-diversity audit: quasi-identifier groups whose
    // sensitive attribute (acctbal band) shows < l distinct values.
    "q268_l_diversity" -> ((s, d) =>
      QualityChecks.lDiversityAudit(
          Tables.customer(s, d)
            .withColumn("bal_band",
              floor(col("c_acctbal") / 1000).cast("long")),
          Seq("c_nationkey", "c_mktsegment"), "bal_band", 8)
        .orderBy("c_nationkey", "c_mktsegment")),

    // L215 — quantile-normalization decile map: each event type's
    // deciles against the pooled reference deciles.
    "q269_quantile_normalize" -> ((s, d) =>
      EncodeOps.quantileNormalizeMap(Tables.events(s, d),
          "event_type", "value")
        .orderBy("event_type", "q")),

    // L216 — MASE backtest: does day-of-week seasonality beat plain
    // persistence for each event type's daily volume?
    "q270_mase" -> ((s, d) =>
      MetricOps.maseBacktest(
          Tables.events(s, d)
            .groupBy(col("event_type"),
              datediff(to_date(col("ts")), lit("1970-01-01")).as("day"))
            .agg(count(lit(1)).as("y")),
          "event_type", "day", "y", season = 7)
        .orderBy("event_type")),

    // L217 — two-sample Cramér–von Mises: whole-CDF drift between the
    // click and view value distributions.
    "q271_cvm_drift" -> ((s, d) =>
      MetricOps.cvmTwoSample(Tables.events(s, d), "event_type",
        "value", "click", "view")),

    // L218 — PACF (lags 1..3) of each event type's daily counts:
    // the AR-order fingerprint behind q181's raw ACF.
    "q272_pacf" -> ((s, d) =>
      MetricOps.pacf(
          Tables.events(s, d)
            .groupBy(col("event_type"),
              datediff(to_date(col("ts")), lit("1970-01-01")).as("day"))
            .agg(count(lit(1)).as("y")),
          "event_type", "day", "y")
        .orderBy("event_type", "lag")),

    // L219 — snapshot profile drift: per-column stats of early vs
    // late orders, the which-column-moved triage.
    "q273_profile_drift" -> ((s, d) => {
      val o = Tables.orders(s, d)
      QualityChecks.profileDrift(
          o.filter(col("o_orderdate") < lit("1995-07-01")),
          o.filter(col("o_orderdate") >= lit("1995-07-01")),
          Seq("o_orderstatus", "o_totalprice", "o_orderpriority"))
        .orderBy("col_name")
    }),

    // L220 — Jonckheere–Terpstra: does order value trend upward
    // across the four order-date quarters (ordered doses)?
    "q274_jonckheere" -> ((s, d) =>
      MetricOps.jonckheereTerpstra(
        Tables.orders(s, d)
          .withColumn("qtr", quarter(col("o_orderdate"))),
        "qtr", "o_totalprice", roundVals = -2)),

    // L221 — Page's trend test: do daily volumes rise monotonically
    // across the week (dow-ordered treatments, week blocks)?
    "q275_page_trend" -> ((s, d) =>
      MetricOps.pageTrend(
          Tables.events(s, d)
            .groupBy(floor(datediff(to_date(col("ts")), lit("1970-01-01"))
                / 7L).cast("long").as("wk"),
              pmod(datediff(to_date(col("ts")), lit("1970-01-01"))
                .cast("long"), lit(7L)).as("dow"))
            .agg(count(lit(1)).as("y")),
          "wk", "dow", "y")),

    // L222 — Siegel repeated-medians trend of monthly order volumes
    // per priority: the 50%-breakdown upgrade of q171's Theil–Sen.
    "q276_siegel_slope" -> ((s, d) =>
      MetricOps.siegelSlope(
          Tables.orders(s, d)
            .groupBy(col("o_orderpriority"),
              months_between(date_trunc("month", col("o_orderdate")),
                lit("1992-01-01").cast("timestamp")).cast("long")
                .as("mi"))
            .agg(count(lit(1)).cast("double").as("n")),
          "o_orderpriority", "mi", "n")
        .orderBy("o_orderpriority")),

    // L223 — STL-lite anomaly screen: rolling-median trend + dow
    // seasonal medians; report days beyond 2× the median absolute
    // remainder.
    "q277_stl_anomaly" -> ((s, d) =>
      MetricOps.stlAnomalies(
          Tables.events(s, d)
            .groupBy(col("event_type"),
              datediff(to_date(col("ts")), lit("1970-01-01")).as("day"))
            .agg(count(lit(1)).as("y")),
          "event_type", "day", "y", halfWin = 3, k = 2.0)
        .orderBy("event_type", "bucket")),

    // L224 — deterministic Poisson-bootstrap CI for mean order value
    // per priority (md5-thresholded Poisson(1) weights, 32 replicas).
    "q278_bootstrap_ci" -> ((s, d) =>
      ExperimentOps.poissonBootstrapCi(Tables.orders(s, d),
          "o_orderpriority", "o_orderkey", "o_totalprice", nBoot = 32)
        .orderBy("o_orderpriority")),

    // L225 — pinball-loss backtest: per-dow train quantiles of each
    // event type's daily volume, scored on the last 9 days (loss +
    // coverage per τ) — the quantile companion to q270's MASE.
    "q279_pinball" -> ((s, d) =>
      MetricOps.pinballEval(
          Tables.events(s, d)
            .groupBy(col("event_type"),
              datediff(to_date(col("ts")), lit("1970-01-01")).as("day"))
            .agg(count(lit(1)).as("y")),
          "event_type", "day", "y", splitX = 19744L, season = 7)
        .orderBy("event_type", "tau")),

    // L226 — Mood's median test: do the five order priorities share a
    // common median order value? (robust cross-check for q197/q198)
    "q280_mood_median" -> ((s, d) =>
      MetricOps.moodMedianTest(Tables.orders(s, d),
        "o_orderpriority", "o_totalprice")),

    // L227 — t-closeness: EMD between each (nation, segment) cell's
    // balance-band distribution and the global one — the release gate
    // l-diversity (q268) can't see.
    "q281_t_closeness" -> ((s, d) =>
      QualityChecks.tCloseness(
          Tables.customer(s, d)
            .withColumn("bal_band",
              floor(col("c_acctbal") / 2000).cast("long")),
          Seq("c_nationkey", "c_mktsegment"), "bal_band")
        .orderBy("c_nationkey", "c_mktsegment")),

    // L228 — precision–recall curve for purchase propensity by event
    // value (thresholds = distinct 1-dp values, descending cums via
    // rangeCumSum — the imbalance-aware twin of q25's AUC).
    "q282_pr_curve" -> ((s, d) =>
      MetricOps.prCurve(
          Tables.events(s, d)
            .withColumn("label",
              when(col("event_type") === "purchase", 1).otherwise(0))
            .withColumn("score", round(col("value"), 1)),
          "label", "score")
        .orderBy("threshold")),

    // L229 — Lorenz curve of customer balances at population deciles:
    // the curve behind q157's Gini scalar.
    "q283_lorenz" -> ((s, d) =>
      MetricOps.lorenzCurve(Tables.customer(s, d), "c_acctbal")
        .orderBy("point")),

    // L230 — G-test of independence, order priority × status: the
    // additive log-likelihood twin of q186's chi-square (= 2N·MI).
    "q284_g_test" -> ((s, d) =>
      MetricOps.gTest(Tables.orders(s, d),
        "o_orderpriority", "o_orderstatus")),

    // L231 — gamma / Somers' D / tau-c per returnflag: q249's pair
    // counts read out with the three classical tie treatments.
    "q285_ordinal_assoc" -> ((s, d) =>
      MetricOps.ordinalAssociation(Tables.lineitem(s, d), "l_returnflag",
          "l_quantity", "l_discount")
        .orderBy("l_returnflag")),

    // L232 — Dunn's post-hoc: WHICH event-type pairs differ in value
    // rank after q198's significant Kruskal–Wallis.
    "q286_dunn" -> ((s, d) =>
      MetricOps.dunnTest(Tables.events(s, d), "event_type", "value")
        .orderBy("g1", "g2")),

    // L233 — Bartlett's equal-variance test on the same pool (the
    // normal-theory sibling of q199's Brown–Forsythe).
    "q287_bartlett" -> ((s, d) =>
      MetricOps.bartlett(Tables.events(s, d), "event_type", "value")),

    // Shared input for q288/q289: a per-(type, user-bucket) base-rate
    // model fit on even event_ids, scored on odd ones. The forecast is
    // an INTEGER-DIV 4-dp quantile (pos·10⁴ div n) so both engines
    // derive the identical decimal — never round(sum/count) (the q193
    // 1-ulp class).
    "q288_brier" -> ((s, d) => {
      val e = labeled(s, d)
        .withColumn("ub", (col("user_id") % 8).cast("long"))
        .withColumn("sp", (col("event_id") % 2).cast("int"))
      val model = e.filter(col("sp") === 0)
        .groupBy(col("event_type"), col("ub"))
        .agg(sum(col("label")).as("__pos"), count(lit(1)).as("__cnt"))
        .withColumn("__p4", expr("(__pos * 10000) div __cnt"))
        .drop("__pos", "__cnt")
      MetricOps.brierDecomposition(
        e.filter(col("sp") === 1).join(broadcast(model),
          Seq("event_type", "ub"))
          .withColumn("pred", col("__p4").cast("double") / 10000),
        "pred", "label")
    }),

    // L234 — Hosmer–Lemeshow decile-calibration χ² on the same
    // forecasts (the deploy gate behind q288's decomposition).
    "q289_hosmer_lemeshow" -> ((s, d) => {
      val e = labeled(s, d)
        .withColumn("ub", (col("user_id") % 8).cast("long"))
        .withColumn("sp", (col("event_id") % 2).cast("int"))
      val model = e.filter(col("sp") === 0)
        .groupBy(col("event_type"), col("ub"))
        .agg(sum(col("label")).as("__pos"), count(lit(1)).as("__cnt"))
        .withColumn("__p4", expr("(__pos * 10000) div __cnt"))
        .drop("__pos", "__cnt")
      MetricOps.hosmerLemeshow(
        e.filter(col("sp") === 1).join(broadcast(model),
          Seq("event_type", "ub"))
          .withColumn("pred", col("__p4").cast("double") / 10000),
        "pred", "label")
    }),

    // L235 — Nelson–Aalen cumulative hazard on q183's first-purchase
    // subjects (the additive twin of the KM curve).
    "q290_nelson_aalen" -> ((s, d) => {
      val subj = Tables.events(s, d).groupBy(col("user_id"))
        .agg(min(col("ts")).as("__t0"),
          min(when(col("event_type") === "purchase", col("ts"))).as("__tp"),
          max(col("ts")).as("__tmax"))
        .select(datediff(coalesce(col("__tp"), col("__tmax")).cast("date"),
            col("__t0").cast("date")).cast("long").as("dur"),
          when(col("__tp").isNotNull, 1).otherwise(0).as("ev"))
      MetricOps.nelsonAalen(subj, "dur", "ev").orderBy("t")
    }),

    // L236 — restricted mean survival time of the same curve: average
    // days-to-first-purchase within the observation horizon.
    "q291_rmst" -> ((s, d) => {
      val subj = Tables.events(s, d).groupBy(col("user_id"))
        .agg(min(col("ts")).as("__t0"),
          min(when(col("event_type") === "purchase", col("ts"))).as("__tp"),
          max(col("ts")).as("__tmax"))
        .select(datediff(coalesce(col("__tp"), col("__tmax")).cast("date"),
            col("__t0").cast("date")).cast("long").as("dur"),
          when(col("__tp").isNotNull, 1).otherwise(0).as("ev"))
      MetricOps.rmst(subj, "dur", "ev")
    }),

    // L237 — two-sample Anderson–Darling (tie-adjusted midrank form):
    // the tail-sensitive drift test next to q148's KS and q264's CvM.
    "q292_anderson_darling" -> ((s, d) =>
      MetricOps.andersonDarlingTwoSample(Tables.events(s, d),
        "event_type", "value", "click", "view")),

    // L238 — Fleiss' kappa over each user's first four event types
    // (users as items, their four events as "raters"): multi-rater
    // agreement next to q151's two-rater Cohen κ.
    "q293_fleiss_kappa" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      MetricOps.fleissKappa(
        Tables.events(s, d).withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 4),
        "user_id", "event_type", nRaters = 4)
    }),

    // L239 — mSPRT always-valid experiment monitor: daily cumulative
    // click-rate diff between parity arms vs the ln(1/α) boundary.
    "q294_msprt" -> ((s, d) =>
      ExperimentOps.msprt(
          labeled(s, d)
            .withColumn("arm", (col("user_id") % 2).cast("int"))
            .withColumn("day",
              datediff(to_date(col("ts")), lit("1970-01-01"))),
          "arm", "day", "label", 0, 1, tau = 0.1)
        .orderBy("day")),

    // L240 — DP noisy counts: seeded-Laplace release of per-segment
    // customer counts (ε = 1), the privacy-release rung after q281.
    "q295_dp_counts" -> ((s, d) =>
      QualityChecks.dpNoisyCounts(Tables.customer(s, d),
          Seq("c_mktsegment"), epsilon = 1.0)
        .orderBy("c_mktsegment")),

    // L241 — SES (α=½) flat-forecast backtest with sMAPE/WAPE on the
    // q279 daily series — the third forecast-eval lens after
    // MASE (q270) and pinball (q279).
    "q296_ses_backtest" -> ((s, d) =>
      MetricOps.sesBacktest(
          Tables.events(s, d)
            .groupBy(col("event_type"),
              datediff(to_date(col("ts")), lit("1970-01-01")).as("day"))
            .agg(count(lit(1)).as("y")),
          "event_type", "day", "y", splitX = 19744L, win = 16)
        .orderBy("event_type")),

    // L242 — candidate-key discovery on orders: which single columns /
    // pairs are merge-safe identities.
    "q297_candidate_keys" -> ((s, d) =>
      QualityChecks.candidateKeys(Tables.orders(s, d), Seq(
          Seq("o_orderkey"), Seq("o_custkey"), Seq("o_orderstatus"),
          Seq("o_custkey", "o_orderdate")))
        .orderBy("combo")),

    // L243 — RFM segmentation of event users into 5×5×5 quantile
    // bands with per-segment population and spend.
    "q298_rfm" -> ((s, d) =>
      EncodeOps.rfmSegments(Tables.events(s, d), "user_id", "ts",
          "value")
        .orderBy("r_q", "f_q", "m_q")),

    // L244 — KM curve with Greenwood bands on q183's subjects: the
    // release-grade survival readout (point estimate ± band).
    "q299_km_ci" -> ((s, d) => {
      val subj = Tables.events(s, d).groupBy(col("user_id"))
        .agg(min(col("ts")).as("__t0"),
          min(when(col("event_type") === "purchase", col("ts"))).as("__tp"),
          max(col("ts")).as("__tmax"))
        .select(datediff(coalesce(col("__tp"), col("__tmax")).cast("date"),
            col("__t0").cast("date")).cast("long").as("dur"),
          when(col("__tp").isNotNull, 1).otherwise(0).as("ev"))
      MetricOps.kaplanMeierCi(subj, "dur", "ev").orderBy("t")
    }),

    // L245 — Granger lag-1 F: do yesterday's clicks explain today's
    // purchases beyond yesterday's purchases? (q258 CCF's follow-up)
    "q300_granger" -> ((s, d) =>
      MetricOps.grangerCausality(
          Tables.events(s, d)
            .groupBy(datediff(to_date(col("ts")), lit("1970-01-01"))
              .as("day"))
            .agg(sum(when(col("event_type") === "purchase", 1L)
              .otherwise(0L)).as("y"),
              sum(when(col("event_type") === "click", 1L)
                .otherwise(0L)).as("x"))
            .withColumn("g", lit("corpus")),
          "g", "day", "y", "x")),

    // L246 — doubly-robust off-policy value of always-click, next to
    // q237's IPS/SNIPS (model split = even event ids).
    "q301_dr_offpolicy" -> ((s, d) =>
      ExperimentOps.doublyRobust(
        labeled(s, d).withColumn("sp", (col("event_id") % 2).cast("int")),
        "event_type", "label", "sp", targetAction = "click",
        clipAt = 10.0)),

    // L247 — Hellinger/Bhattacharyya distance between click and view
    // value histograms: the bounded drift metric next to PSI (q106),
    // JS (q122), W₁ (q184).
    "q302_hellinger" -> ((s, d) =>
      MetricOps.hellingerDrift(Tables.events(s, d), "event_type",
        "value", "click", "view")),

    // L248 — CMH stratified 2×2: user-parity exposure vs label outcome
    // holding event type fixed (the Simpson-proof pooled test).
    "q303_cmh" -> ((s, d) =>
      MetricOps.cmhTest(
        labeled(s, d)
          .withColumn("exposed", (col("user_id") % 2).cast("int")),
        "event_type", "exposed", "label")),

    // L249 — Moran's I of mean supplier balance over the same-region
    // nation graph: do neighboring nations hold similar balances?
    "q304_morans_i" -> ((s, d) => {
      val nodes = Tables.supplier(s, d)
        .groupBy(col("s_nationkey"))
        .agg((sum(round(col("s_acctbal"), 2).cast("decimal(18,2)"))
          .cast("double") / count(lit(1))).as("xbar"))
      val nat = Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_regionkey"))
      val edges = nat.select(col("n_nationkey").as("src"),
          col("n_regionkey").as("rk"))
        .join(nat.select(col("n_nationkey").as("dst"),
          col("n_regionkey").as("rk")), "rk")
        .select(col("src"), col("dst"))
      GraphOps.moransI(nodes, "s_nationkey", "xbar", edges, "src", "dst")
    }),

    // L250 — information-gain ranking of three candidate features for
    // the purchase label (C4.5 gain ratio, before any training).
    "q305_info_gain" -> ((s, d) =>
      MetricOps.featureInfoGain(
          Tables.events(s, d)
            .withColumn("label",
              when(col("event_type") === "purchase", 1).otherwise(0))
            .withColumn("ub", (col("user_id") % 8).cast("long"))
            .withColumn("dow",
              pmod(datediff(to_date(col("ts")), lit("1970-01-01")), lit(7)))
            .withColumn("vb", floor(col("value") / 50).cast("long")),
          "label", Seq("ub", "dow", "vb"))
        .orderBy("feature")),

    // L251 — Chow break test at the q279/q296 split day: does each
    // event type's daily-volume trend line break at the holdout?
    "q306_chow" -> ((s, d) =>
      MetricOps.chowTest(
          Tables.events(s, d)
            .groupBy(col("event_type"),
              datediff(to_date(col("ts")), lit("1970-01-01")).as("day"))
            .agg(count(lit(1)).as("y")),
          "event_type", "day", "y", breakX = 19744L)
        .orderBy("event_type")),

    // L252 — Kuiper two-sample V on the click/view value histograms:
    // the tail-AND-middle-sensitive sibling of KS (q148) / AD (q292).
    "q307_kuiper" -> ((s, d) =>
      MetricOps.kuiperTwoSample(Tables.events(s, d), "event_type",
        "value", "click", "view")),

    // L253 — Cronbach's α over each user's first four event values as
    // a 4-item scale: are they one consistent "engagement" measure?
    "q308_cronbach" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      MetricOps.cronbachAlpha(
        Tables.events(s, d).withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 4),
        "user_id", "rn", "value", k = 4)
    }),

    // L254 — Chapman capture–recapture: even-day vs odd-day user
    // snapshots → how many users exist that neither window saw?
    "q309_chapman" -> ((s, d) =>
      QualityChecks.chapmanEstimate(
        Tables.events(s, d).withColumn("side",
          pmod(datediff(to_date(col("ts")), lit("1970-01-01")), lit(2))),
        "user_id", "side", 0, 1)),

    // L255 — Gumbel block-maxima fit of weekly peak daily volume per
    // event type, with P(week peak > 500) capacity readout.
    "q310_gumbel" -> ((s, d) =>
      MetricOps.gumbelFit(
          Tables.events(s, d)
            .groupBy(col("event_type"),
              datediff(to_date(col("ts")), lit("1970-01-01")).as("day"))
            .agg(count(lit(1)).as("y")),
          "event_type", "day", "y", blockSize = 7, level = 500.0)
        .orderBy("event_type")),

    // L256 — partial correlation qty~price | discount per returnflag:
    // is the qty/price association real once discount is held fixed?
    "q311_partial_corr" -> ((s, d) =>
      MetricOps.partialCorrelation(Tables.lineitem(s, d), "l_returnflag",
          "l_quantity", "l_extendedprice", "l_discount")
        .orderBy("l_returnflag")),

    // L257 — 2×2 epi readout (OR/RR/risk-diff/Cohen h + Wald CIs) for
    // parity exposure vs click label: effect sizes behind q303's CMH.
    "q312_epi" -> ((s, d) =>
      MetricOps.epiTable(
        labeled(s, d)
          .withColumn("exposed", (col("user_id") % 2).cast("int")),
        "exposed", "label")),

    // L258 — Bowker symmetry of each user's first→second event-type
    // transition: is category churn directionally balanced?
    "q313_bowker" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val r = Tables.events(s, d).withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
      MetricOps.bowkerSymmetry(
        r.filter(col("rn") === 1)
          .select(col("user_id"), col("event_type").as("frm"))
          .join(r.filter(col("rn") === 2)
            .select(col("user_id"), col("event_type").as("tto")),
            "user_id"),
        "frm", "tto")
    }),

    // L259 — seasonal Mann–Kendall (dow-matched pairs) on daily
    // volume per event type: the trend test weekly cycles can't fool.
    "q314_seasonal_mk" -> ((s, d) =>
      MetricOps.seasonalMannKendall(
          Tables.events(s, d)
            .groupBy(col("event_type"),
              datediff(to_date(col("ts")), lit("1970-01-01")).as("day"))
            .agg(count(lit(1)).as("y")),
          "event_type", "day", "y", season = 7)
        .orderBy("event_type")),

    // L260 — Yuen's trimmed t between click and view values: the
    // outlier-proof mean comparison next to q187's Mann–Whitney.
    "q315_yuen" -> ((s, d) =>
      MetricOps.yuenTrimmedTest(Tables.events(s, d), "event_type",
        "value", "click", "view")),

    // L261 — variance-to-mean dispersion screen on daily volume per
    // type: Poisson-ish or bursty? (precondition for rate models)
    "q316_dispersion" -> ((s, d) =>
      MetricOps.dispersionIndex(
          Tables.events(s, d)
            .groupBy(col("event_type"),
              datediff(to_date(col("ts")), lit("1970-01-01")).as("day"))
            .agg(count(lit(1)).as("y")),
          "event_type", "y")
        .orderBy("event_type")),

    // L262 — temperature-scaled (α=0.7) corpus-mixing weights per
    // document source, with expected samples at a 100k budget.
    "q317_temperature" -> ((s, d) =>
      MetricOps.temperatureWeights(Tables.documents(s, d), "source",
          alpha = 0.7, budget = 100000L)
        .orderBy("source")),

    // L263 — weekly PSI of event values vs the first week: WHEN did
    // the value distribution drift (q106's scalar, per period).
    "q318_psi_period" -> ((s, d) =>
      MetricOps.psiByPeriod(
          Tables.events(s, d)
            .withColumn("week",
              expr("datediff(to_date(ts), DATE'1970-01-01') div 7")),
          "value", "week", binWidth = 50.0, nBins = 10)
        .orderBy("week")),

    // L264 — quantity-weighted median extended price per returnflag:
    // the center of shipped MASS, not of line rows.
    "q319_weighted_median" -> ((s, d) =>
      MetricOps.weightedMedian(Tables.lineitem(s, d), "l_returnflag",
          "l_extendedprice", "l_quantity")
        .orderBy("l_returnflag")),

    // L265 — Kendall's W: do the weeks agree on the event-type volume
    // ranking? (the agreement readout behind q255's Friedman)
    "q320_kendall_w" -> ((s, d) =>
      MetricOps.kendallW(
        Tables.events(s, d)
          .groupBy(expr("datediff(to_date(ts), DATE'1970-01-01') div 7")
            .as("week"), col("event_type"))
          .agg(count(lit(1)).as("y")),
        "week", "event_type", "y")),

    // L266 — CART best Gini split of event value for the purchase
    // label: the tree-builder primitive as one histogram pass.
    "q321_gini_split" -> ((s, d) =>
      MetricOps.bestGiniSplit(
        Tables.events(s, d)
          .withColumn("label",
            when(col("event_type") === "purchase", 1).otherwise(0)),
        "value", "label")),

    // L267 — Youden's J optimal threshold on the same score: the
    // deployment cut the q282 PR curve doesn't pick for you.
    "q322_youden" -> ((s, d) =>
      MetricOps.youdenThreshold(
        Tables.events(s, d)
          .withColumn("label",
            when(col("event_type") === "purchase", 1).otherwise(0))
          .withColumn("score", round(col("value"), 1)),
        "label", "score")),

    // L268 — Herfindahl concentration of order value by customer
    // within each priority: is one buyer dominating a class?
    "q323_hhi" -> ((s, d) =>
      MetricOps.herfindahl(Tables.orders(s, d), "o_orderpriority",
          "o_custkey", "o_totalprice")
        .orderBy("o_orderpriority")),

    // L269 — Q-Q decile table, click vs view values: WHERE in the
    // distribution the drift scalars (q106/q184/q302) live.
    "q324_qq" -> ((s, d) =>
      MetricOps.qqTable(Tables.events(s, d), "event_type", "value",
          "click", "view")
        .orderBy("quantile")),

    // L270 — Markov entropy rate of per-user event-type sequences:
    // how predictable is the next action? (q173's matrix as a scalar)
    "q325_entropy_rate" -> ((s, d) =>
      MetricOps.markovEntropyRate(Tables.events(s, d), "user_id",
        Seq(col("ts"), col("event_id")), "event_type")),

    // L271 — Hill diversity numbers (D0/D1/D2 + evenness) of user
    // participation per event type: 1/D2 is q323's HHI.
    "q326_hill" -> ((s, d) =>
      MetricOps.hillNumbers(Tables.events(s, d), "event_type",
          "user_id")
        .orderBy("event_type")),

    // L272 — diagonal-Mahalanobis joint-outlier audit over lineitem
    // (qty, price, discount) per returnflag at the chi2_3 99.9% cut.
    "q327_mahalanobis" -> ((s, d) =>
      MetricOps.mahalanobisOutliers(Tables.lineitem(s, d),
          "l_returnflag",
          Seq("l_quantity", "l_extendedprice", "l_discount"),
          cut = 16.27)
        .orderBy("l_returnflag")),

    // L273 — Benford second-digit audit of order values: the
    // fabrication screen q167's first-digit curve can't see.
    "q328_benford2" -> ((s, d) =>
      QualityChecks.benfordSecondDigit(Tables.orders(s, d),
          "o_totalprice")
        .orderBy("digit")),

    // L274 — mutual k-NN over the multi-probe IVF candidate lists:
    // q191's 100 TB twin — the pair stage is an equi-join on the sign-
    // bucket cell (never a cross join) at the count-stepped adaptive
    // width, the reciprocal check identical.
    "q329_mutual_knn_ann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.mutualKnnBucketed(emb, "vec_id",
          "embedding", 5, SimilarityOps.adaptiveSignBits(emb))
        .orderBy("id_a", "id_b")
    }),

    // L275 — label propagation over the BUCKETED mutual-kNN graph:
    // q194's scale twin, same seeds, equi-join-only edge list at the
    // count-stepped adaptive width.
    "q330_label_prop_ann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val mk = SimilarityOps.mutualKnnBucketed(emb, "vec_id",
        "embedding", 5, SimilarityOps.adaptiveSignBits(emb))
      val seeds = emb.filter(col("vec_id") % 3 === 0)
        .select(col("vec_id"), col("label"))
      GraphOps.labelPropagate(mk, "id_a", "id_b", seeds, "vec_id",
          "label")
        .orderBy("vec_id")
    }),

    // L276 — rec-list quality metrics over the multi-probe ANN top-5
    // lists: q218's scale twin (candidate lists from the bucketed
    // equi-join; the ILS pair stage stays the small k² self-join).
    "q331_rec_list_ann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val recs = SimilarityOps.annTopKMultiProbe(emb, "vec_id",
        "embedding", 5, SimilarityOps.adaptiveSignBits(emb))
      SimilarityOps.recListMetrics(recs, "vec_id", "neighbor_id",
        emb, "vec_id", "embedding")
    }),

    // L277 — Hamming-<=2 multi-probe ANN top-3: the next notch of the
    // recall/cost dial (q35 is nprobe=1, q60/q329 are Hamming-1) —
    // same equi-join-on-cell plan, ~0.9 recall at signBits=4.
    "q332_ann_h2" -> ((s, d) =>
      SimilarityOps.annTopKMultiProbe2(Tables.embeddings(s, d),
          "vec_id", "embedding", 3, 4)
        .orderBy("vec_id", "neighbor_id")),

    // L278 — DSIR importance weights (Xie et al. 2023): per-doc average
    // hashed-bigram log-likelihood ratio, target domain = src0-2 vs the
    // raw corpus. One corpus shuffle; 256-bucket models broadcast.
    "q333_importance_weights" -> ((s, d) =>
      SamplingOps.importanceWeights(Tables.documents(s, d), "doc_id",
          "text", col("source").isin("src0", "src1", "src2"))
        .orderBy("doc_id")),

    // L279 — importance RESAMPLING end-to-end: the q333 weights gated
    // at each source's own 0.8-quantile (quantileGate), i.e. keep the
    // most target-like 20% per source — corpus never shuffles in the
    // gate, thresholds broadcast.
    "q334_dsir_gate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val iw = SamplingOps.importanceWeights(docs, "doc_id", "text",
          col("source").isin("src0", "src1", "src2"))
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
      MixtureOps.quantileGate(iw, "source", "doc_id", "iw", 0.8)
        .orderBy("source")
    }),

    // L280 — greedy k-center coreset (Gonzalez farthest-point): 6
    // diversity-maximizing centers over the embedding corpus, with the
    // coverage radius as each is added. k broadcast passes, no window.
    "q335_kcenter" -> ((s, d) =>
      SimilarityOps.kCenterSelect(Tables.embeddings(s, d),
          "vec_id", "embedding", 6)
        .orderBy("sel_round")),

    // L281 — Gopher-style composite quality-rule report: per-rule
    // violation counts/rates + the all-pass row, every guard an exact
    // integer cross-multiplication.
    "q336_gopher_rules" -> ((s, d) =>
      TextOps.gopherRules(Tables.documents(s, d), "doc_id", "text",
          STOPWORDS)
        .orderBy("rule")),

    // L282 — hard-negative mining: top-3 most-similar DIFFERENT-label
    // neighbors per anchor from the multi-probe sign-bucket candidates
    // (contrastive training-pair construction; equi-join only).
    "q337_hard_negatives" -> ((s, d) =>
      SimilarityOps.hardNegatives(Tables.embeddings(s, d),
          "vec_id", "embedding", "label", 3, 4)
        .orderBy("vec_id", "neighbor_id")),

    // L283 — LSH banding advisor: per (bands, rows) factorization, the
    // closed-form S-curve numbers AND the measured candidate workload
    // on the actual corpus (the knob report consulted before a 100 TB
    // dedup run). Target Jaccard 0.5.
    "q338_lsh_advisor" -> ((s, d) =>
      DedupOps.lshBandingAdvisor(
          DedupOps.shingles(Tables.documents(s, d), "doc_id", "text"),
          "doc_id", 0.5)
        .orderBy("bands")),

    // L284 — dedup threshold sweep: pairs/docs removed at each Jaccard
    // cutoff over the verified near-dup pairs (the dedup aggressiveness
    // curve read before committing a threshold).
    "q339_dedup_threshold_sweep" -> ((s, d) =>
      DedupOps.dedupThresholdSweep(
          DedupOps.shingles(Tables.documents(s, d), "doc_id", "text"),
          "doc_id")
        .orderBy("tidx")),

    // L285 — IVF cell-balance advisor: per quantizer width, non-empty
    // cells, largest cell, and the within-cell pair work annTopK would
    // evaluate (the signBits dial's workload half; recall is pinned by
    // LshRecallSpec).
    "q340_ivf_advisor" -> ((s, d) =>
      SimilarityOps.ivfCellAdvisor(Tables.embeddings(s, d),
          "vec_id", "embedding", 6)
        .orderBy("sign_bits")),

    // L286 — per-doc Gopher rule flags in pure row-local expression
    // form (array HOFs, no token shuffle) — the stream-ready twin of
    // q336's aggregate report; flag agreement proven in Round19OpsSpec.
    "q341_gopher_flags" -> ((s, d) =>
      TextOps.gopherFlags(Tables.documents(s, d), "doc_id", "text",
          STOPWORDS)
        .orderBy("doc_id")),

    // L287 — packing-budget advisor: bins + fill rate per candidate
    // context length (one running-sum pass, bins derived per budget by
    // integer division — the q111 packing's dial report).
    "q342_packing_advisor" -> ((s, d) =>
      TextOps.packingAdvisor(Tables.documents(s, d), "source", "doc_id",
          "text", Seq(512L, 1024L, 2048L, 4096L))
        .orderBy("budget")),

    // L288 — kNN label-agreement audit: per-vector same-label fraction
    // of the multi-probe ANN top-5 — the noisy-label screen (low
    // agreement = review-first candidates).
    "q343_label_agreement" -> ((s, d) =>
      SimilarityOps.labelAgreement(Tables.embeddings(s, d),
          "vec_id", "embedding", "label", 5, 4)
        .orderBy("vec_id")),

    // L289 — per-source corpus datasheet: volume, language spread,
    // exact-dup load, Gopher pass rate — the one-stop audit table a
    // mixture design reads first.
    "q344_corpus_datasheet" -> ((s, d) =>
      TextOps.corpusDatasheet(Tables.documents(s, d), "source",
          "doc_id", "text", "lang", STOPWORDS)
        .orderBy("source")),

    // L290 — trigram "stupid backoff" cross-entropy (Brants et al.
    // 2007): model trained on the even-doc_id half, scored on every
    // doc, unseen n-grams back off 0.4 → 0.16·add-one — the held-out
    // perplexity gate (q93's bigram form never backs off).
    "q345_trigram_backoff" -> ((s, d) =>
      TextOps.trigramBackoffXent(Tables.documents(s, d), "doc_id",
          "text")
        .orderBy("doc_id")),

    // L291 — SemDeDup (Abbas et al. 2023): semantic near-dup flags
    // inside sign-bucket cells, keep-the-farthest-from-centroid rule;
    // pair stage is the q60 equi-join shape, centroids broadcast.
    "q346_semdedup" -> ((s, d) =>
      SimilarityOps.semDedup(Tables.embeddings(s, d), "vec_id",
          "embedding", 0.3, 4)
        .orderBy("vec_id")),

    // L292 — Davies–Bouldin cluster-quality report per label: scatter
    // + worst separation ratio; k² centroid cross only, corpus never
    // self-joins.
    "q347_davies_bouldin" -> ((s, d) =>
      SimilarityOps.daviesBouldin(Tables.embeddings(s, d), "vec_id",
          "embedding", "label")
        .orderBy("label")),

    // L293 — epoch-capped mixture allocation (LLaMA-style repetition
    // caps): temperature weights, 1.2-epoch corpus budget, per-source
    // cap at 1.25 epochs, one redistribution round. |sources|-row math.
    "q348_epoch_capped_mix" -> ((s, d) =>
      MixtureOps.epochCappedMix(Tables.documents(s, d), "source",
          "text")
        .orderBy("source")),

    // L294 — tokenizer-fertility report per language: tokens/word,
    // bytes/token, chars/word as exact half-up divisions (the
    // per-language compute-cost table a mixture owner reads).
    "q349_token_fertility" -> ((s, d) =>
      TextOps.tokenFertility(Tables.documents(s, d), "lang", "text")
        .orderBy("lang")),

    // L295 — contamination SPANS vs the src0 benchmark: per-doc
    // matched-position count + longest consecutive run (verbatim
    // leakage detector; q94 reports only the aggregate hit rate).
    "q350_contamination_spans" -> ((s, d) =>
      DedupOps.contaminationSpans(Tables.documents(s, d), "doc_id",
          "text", col("source") === "src0")
        .orderBy("doc_id")),

    // L296 — CCNet perplexity terciles per language (Wenzek et al.
    // 2020): head/middle/tail thirds by bigram cross-entropy,
    // per-language windows only; the keep-head+middle prune table.
    "q351_ccnet_buckets" -> ((s, d) =>
      TextOps.ccnetBuckets(Tables.documents(s, d), "doc_id", "text",
          "lang")
        .orderBy("lang", "tercile")),

    // L297 — balanced output-shard plan (snake deal over the global
    // size order): the manifest a 100 TB corpus write is planned from;
    // globalRank histogram, never a single-partition window.
    "q352_shard_plan" -> ((s, d) =>
      MixtureOps.shardPlan(Tables.documents(s, d), "doc_id", "text", 8)
        .orderBy("shard")),

    // L298 — log2-bucketed unigram count-of-counts per source (the
    // Good–Turing front-end; bucket 0 = hapax mass). Bit-length
    // bucketing — an exact integer path, ≤64 rows/source at any scale.
    "q353_freq_spectrum" -> ((s, d) =>
      TextOps.freqSpectrum(Tables.documents(s, d), "source", "text")
        .orderBy("source", "bucket")),

    // L299 — Moore–Lewis cross-entropy-difference selection: in-domain
    // (src0) vs corpus bigram models, add-one smoothed over the shared
    // vocabulary; selected = score > 0.
    "q354_moore_lewis" -> ((s, d) =>
      TextOps.mooreLewis(Tables.documents(s, d), "doc_id", "text",
          col("source") === "src0")
        .orderBy("doc_id")),

    // L300 — simplified (centroid) silhouette per label: the O(n·k)
    // cluster-quality score standing in for O(n²) Rousseeuw at scale.
    "q355_silhouette" -> ((s, d) =>
      SimilarityOps.simplifiedSilhouette(Tables.embeddings(s, d),
          "vec_id", "embedding", "label")
        .orderBy("label")),

    // L301 — k-NN-distance outlier flags over the multi-probe ANN
    // candidate set (LOF's k-dist on the deterministic sign buckets).
    "q356_knn_outlier" -> ((s, d) =>
      SimilarityOps.knnDistOutlier(Tables.embeddings(s, d), "vec_id",
          "embedding")
        .orderBy("vec_id")),

    // L302 — per-source yield funnel: docs+tokens surviving raw →
    // lang allowlist → Gopher pass → exact dedup keep-first.
    "q357_yield_funnel" -> ((s, d) =>
      TextOps.yieldFunnel(Tables.documents(s, d), "source", "doc_id",
          "text", "lang", Seq("en", "de", "es"), STOPWORDS)
        .orderBy("source")),

    // L303 — near-dup pair QA: verified LSH pairs by Jaccard decile
    // with containment and size-ratio means (the banding audit).
    "q358_pair_qa" -> ((s, d) =>
      DedupOps.pairQaReport(
          DedupOps.shingles(Tables.documents(s, d), "doc_id", "text"),
          "doc_id")
        .orderBy("decile")),

    // L304 — cross-source duplicate-flow matrix at 20-token chunk
    // granularity: which source pairs share duplicated passages
    // (dedup provenance; diagonal = within-source mirrors).
    "q359_dup_flow" -> ((s, d) =>
      DedupOps.dupFlowMatrix(Tables.documents(s, d), "source",
          "text", 20)
        .orderBy("source_a", "source_b")),

    // L305 — content-defined chunking (rolling-cut boundaries on token
    // hashes): per-doc chunk profile + cross-doc duplicate-chunk load,
    // robust to edits where fixed windows shift.
    "q360_cdc_chunks" -> ((s, d) =>
      TextOps.cdcChunks(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // L306 — rank-average quality ensemble: three signals blended as
    // exact ppm percentiles (globalRank histograms), top quartile kept.
    "q361_rank_blend" -> ((s, d) =>
      TextOps.rankBlend(Tables.documents(s, d), "doc_id", "text",
          STOPWORDS)
        .orderBy("doc_id")),

    // L307 — first-iteration BPE merge table: top-20 adjacent char
    // pairs with exact corpus share (the tokenizer-training preview).
    "q362_bpe_merges" -> ((s, d) =>
      TextOps.bpeMergeStats(Tables.documents(s, d), "text")),

    // L308 — post-dedup mixture correction: survivor token counts,
    // feasible budget, corrective per-source sampling rates.
    "q363_mixture_correction" -> ((s, d) =>
      MixtureOps.mixtureCorrection(Tables.documents(s, d), "source",
          "text")
        .orderBy("source")),

    // L309 — per-doc KL novelty vs the corpus unigram background (the
    // diversity-aware selection signal).
    "q364_kl_novelty" -> ((s, d) =>
      TextOps.klNovelty(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // L310 — prefix-family / continuation-link duplicate audit on
    // 15-token boundary hashes (truncated variants + split crawls).
    "q365_prefix_dup" -> ((s, d) =>
      DedupOps.prefixSuffixDup(Tables.documents(s, d), "doc_id",
          "text", 15)
        .orderBy("doc_id")),

    // L311 — Heaps'-law vocabulary-growth fit per source (β and the
    // 10×-scale vocabulary multiplier).
    "q366_heaps_law" -> ((s, d) =>
      TextOps.heapsLaw(Tables.documents(s, d), "source", "text")
        .orderBy("source")),

    // L312 — cross-document self-repetition score per source (the
    // synthetic-data mode-collapse audit).
    "q367_selfrep" -> ((s, d) =>
      TextOps.selfRepetition(Tables.documents(s, d), "source",
          "doc_id", "text")
        .orderBy("source")),

    // L313 — context-length truncation-loss sweep (tokens lost per
    // candidate cap, exact ppm).
    "q368_truncation_loss" -> ((s, d) =>
      TextOps.truncationLoss(Tables.documents(s, d), "text")
        .orderBy("cap")),

    // L314 — embedding isotropy audit per label: exact mean pairwise
    // cosine via the centroid identity (no pair join).
    "q369_isotropy" -> ((s, d) =>
      SimilarityOps.isotropyAudit(Tables.embeddings(s, d),
          "embedding", "label")
        .orderBy("label")),

    // L315 — per-shard training-order interleave audit (k-category
    // runs vs the random-interleave expectation).
    "q370_interleave" -> ((s, d) =>
      MixtureOps.interleaveAudit(Tables.documents(s, d), "doc_id",
          "source", 8)
        .orderBy("shard")),

    // L316 — per-shard unigram JS divergence vs the corpus (shard
    // CONTENT homogeneity; absent-token tail in closed form).
    "q371_shard_js" -> ((s, d) =>
      MixtureOps.shardJsAudit(Tables.documents(s, d), "doc_id",
          "text", 8)
        .orderBy("shard")),

    // L317 — dedup survivor-policy price comparison over 15-token
    // prefix families (keep-first / longest / most-distinct).
    "q372_dedup_policy" -> ((s, d) =>
      DedupOps.dedupPolicyCompare(Tables.documents(s, d), "doc_id",
          "text", 15)
        .orderBy("policy")),

    // L318 — term burstiness table (Church–Gale): conditional mean +
    // variance-to-mean ratio per df≥5 term.
    "q373_burstiness" -> ((s, d) =>
      TextOps.termBurstiness(Tables.documents(s, d), "doc_id",
          "text", 5)
        .orderBy("term")),

    // L319 — source-pair vocabulary Jaccard matrix (register-level
    // overlap; the vocab twin of q359's passage flow).
    "q374_vocab_overlap" -> ((s, d) =>
      TextOps.vocabOverlap(Tables.documents(s, d), "source", "text")
        .orderBy("source_a", "source_b")),

    // L320 — topic × language composition grid with per-language row
    // shares (coverage audit).
    "q375_topic_lang_grid" -> ((s, d) =>
      TextOps.topicLangGrid(Tables.documents(s, d), "lang", "doc_id",
          "text", LANG_PROFILES)
        .orderBy("lang", "lang_pred")),

    // L321 — Gopher-rule ablation: solo vs gross doc/token loss per
    // quality rule (filter-stack tuning table).
    "q376_gopher_ablation" -> ((s, d) =>
      TextOps.gopherAblation(Tables.documents(s, d), "doc_id", "text",
          STOPWORDS)
        .orderBy("rule")),

    // L322 — per-source unigram JS divergence vs the corpus (which
    // source pulls the mixture; the ranking is the signal).
    "q377_source_js" -> ((s, d) =>
      MixtureOps.sourceJsAudit(Tables.documents(s, d), "source",
          "text")
        .orderBy("source")),

    // L323 — quality × length decile copula grid with independence
    // lift (selection-bias audit).
    "q378_quality_length_grid" -> ((s, d) =>
      TextOps.qualityLengthGrid(Tables.documents(s, d), "doc_id",
          "text")
        .orderBy("len_decile", "q_decile")),

    // L324 — within- vs cross-source exact-dedup savings projection
    // (the shuffle-or-not decision table).
    "q379_dedup_savings" -> ((s, d) =>
      DedupOps.dedupSavings(Tables.documents(s, d), "doc_id",
          "source", "text")
        .orderBy("source")),

    // L325 — crawl-to-crawl corpus delta datasheet over two
    // deterministic membership snapshots (80% overlap by id hash).
    "q380_corpus_delta" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      MixtureOps.corpusDelta(
          docs.filter(MixtureOps.membership("doc_id") < 0.9),
          docs.filter(MixtureOps.membership("doc_id") >= 0.1),
          "doc_id", "source", "text")
        .orderBy("source")
    }),

    // L326 — SemDeDup tau sweep: drop counts per threshold from ONE
    // pair pass (integer-percent sweep keys).
    "q381_semdedup_sweep" -> ((s, d) =>
      SimilarityOps.semDedupSweep(Tables.embeddings(s, d), "vec_id",
          "embedding", 4)
        .orderBy("tau_pct")),

    // L327 — standardized TTR (first-30-token window) + hapax ratio
    // per source (length-controlled lexical diversity).
    "q382_sttr" -> ((s, d) =>
      TextOps.sttr(Tables.documents(s, d), "source", "text", 30)
        .orderBy("source")),

    // L328 — within-doc positional novelty curve (mode-collapse /
    // boilerplate shows as a crashing late-decile novelty rate).
    "q383_position_novelty" -> ((s, d) =>
      TextOps.positionNovelty(Tables.documents(s, d), "doc_id", "text")
        .orderBy("decile")),

    // L329 — declared-vs-predicted language confusion grid (the
    // mislabeled-feed quarantine evidence table).
    "q384_lang_confusion" -> ((s, d) =>
      TextOps.langConfusion(Tables.documents(s, d), "lang", "text",
          LANG_PROFILES)
        .orderBy("lang", "lang_pred")),

    // L330 — per-label centroid drift between two membership
    // snapshots (the re-embed / index-rebuild decision table).
    "q385_embedding_drift" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      SimilarityOps.embeddingDrift(
          e.filter(MixtureOps.membership("vec_id") < 0.9),
          e.filter(MixtureOps.membership("vec_id") >= 0.1),
          "vec_id", "embedding", "label")
        .orderBy("label")
    }),

    // L331 — exact-dup load by length decile (is dedup redundant with
    // a min-length gate, or complementary?).
    "q386_dup_length_profile" -> ((s, d) =>
      DedupOps.dupLengthProfile(Tables.documents(s, d), "doc_id",
          "text")
        .orderBy("len_decile")),

    // L332 — MinHash estimate vs exact Jaccard fidelity per signature
    // size (how many hashes does this corpus need?).
    "q387_minhash_fidelity" -> ((s, d) =>
      DedupOps.minhashFidelity(Tables.documents(s, d), "doc_id",
          "text")
        .orderBy("n_hashes")),

    // L333 — salted-sampler independence audit across keep rates
    // (observed vs expected joint ppm from one agg).
    "q388_sample_overlap" -> ((s, d) =>
      MixtureOps.sampleOverlap(Tables.documents(s, d), "doc_id")
        .orderBy("rate_pct")),

    // L334 — per-source embedding cohesion: isotropyAudit keyed by
    // the documents join (mean pairwise cosine via the centroid
    // identity — no pair sweep).
    "q389_source_cohesion" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        col("source"))
      val emb = Tables.embeddings(s, d)
      SimilarityOps.isotropyAudit(
          emb.join(docs, emb("vec_id") === docs("doc_id")),
          "embedding", "source")
        .withColumnRenamed("label", "source")
        .orderBy("source")
    }),

    // L335 — near-dup cluster source purity: local-boilerplate vs
    // cross-source syndication (the global-dedup pricing table).
    "q390_neardup_cluster_purity" -> ((s, d) =>
      DedupOps.neardupClusterPurity(Tables.documents(s, d), "doc_id",
          "source", "text")
        .orderBy("n_sources")),

    // L336 — Gopher pass-rate drift between membership snapshots per
    // source (the crawl-regression tripwire).
    "q391_quality_delta" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextOps.qualityDelta(
          docs.filter(MixtureOps.membership("doc_id") < 0.9),
          docs.filter(MixtureOps.membership("doc_id") >= 0.1),
          "source", "doc_id", "text", STOPWORDS)
        .orderBy("source")
    }),

    // L337 — ANN kNN-graph in-degree histogram (hubs and anti-hubs in
    // one table).
    "q392_hubness" -> ((s, d) =>
      SimilarityOps.hubnessAudit(Tables.embeddings(s, d), "vec_id",
          "embedding", 5, 4)
        .orderBy("in_degree")),

    // L338 — recorded-vs-recomputed char-count consistency per source
    // (extractor/encoding damage tripwire).
    "q393_metadata_consistency" -> ((s, d) =>
      TextOps.metadataConsistency(Tables.documents(s, d), "source",
          "text", "n_chars")
        .orderBy("source")),

    // L339 — frozen-vocabulary OOV transfer: top-100 vocab from the
    // old snapshot, per-source OOV ppm on the new one.
    "q394_oov_transfer" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextOps.oovTransfer(
          docs.filter(MixtureOps.membership("doc_id") < 0.9),
          docs.filter(MixtureOps.membership("doc_id") >= 0.1),
          "source", "text", 100)
        .orderBy("source")
    }),

    // L340 — cross-source pack contamination per context budget (the
    // boundary-masking decision table; per-shard packing, no global
    // cumsum).
    "q395_pack_contamination" -> ((s, d) =>
      TextOps.packContamination(Tables.documents(s, d), "doc_id",
          "text", "source", Seq(64L, 128L, 256L))
        .orderBy("budget")),

    // L341 — SRP (SimHash-for-cosine) fidelity per signature width
    // over bucket candidate pairs; cos lookup from a literal table,
    // no per-row transcendental.
    "q396_srp_fidelity" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.srpFidelity(emb, "vec_id",
          "embedding", Seq(4, 8, 16),
          signBits = SimilarityOps.adaptiveSignBits(emb))
        .orderBy("width")
    }),

    // L342 — measured ANN recall@5 vs the exact top-5 at probe levels
    // H<=0/1/2 on a 1-in-20 query sample (the recall/cost dial as a
    // declared query; the sampled brute-force side is the documented
    // exact-baseline cartesian class).
    "q397_ann_recall" -> ((s, d) =>
      SimilarityOps.annRecallAudit(Tables.embeddings(s, d), "vec_id",
          "embedding", 5, 4, 20)
        .orderBy("level")),

    // L343 — cross-language near-dup mining (translation pairs /
    // template spam; invisible to text-shingle dedup).
    "q398_crosslang_neardup" -> ((s, d) =>
      SimilarityOps.crossLangNearDup(Tables.embeddings(s, d), "vec_id",
          "embedding", Tables.documents(s, d), "doc_id", "lang", 0.35, 4)
        .orderBy("lang_lo", "lang_hi")),

    // L344 — transitivity of the verified near-dup graph (is
    // "cluster = transitive closure" safe for the survivor policy?).
    "q399_dedup_transitivity" -> ((s, d) =>
      GraphOps.transitivity(
        DedupOps.lshJaccard(
            DedupOps.shingles(Tables.documents(s, d), "doc_id", "text"),
            "doc_id", 4, 2)
          .filter(col("jaccard") >= 0.5),
        "doc_a", "doc_b")),

    // L345 — per-source char-bigram compressibility (order-1 entropy
    // rate in bits/char; the storage/IO cost planner).
    "q400_char_compressibility" -> ((s, d) =>
      TextOps.charCompressibility(Tables.documents(s, d), "source",
          "text")
        .orderBy("source")),

    // L346 — Matryoshka prefix-dim cosine fidelity per truncation
    // budget (is 16-of-64 dims safe for retrieval?).
    "q401_matryoshka_fidelity" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.matryoshkaFidelity(emb,
          "vec_id", "embedding", Seq(8, 16, 32),
          signBits = SimilarityOps.adaptiveSignBits(emb))
        .orderBy("dim")
    }),

    // L347 — near-dup train/eval split leakage per source (the
    // memorization-inflation audit of an id-hash split).
    "q402_split_leakage" -> ((s, d) =>
      DedupOps.splitLeakage(Tables.documents(s, d), "doc_id",
          "source", "text", 0.5)
        .orderBy("source")),

    // L348 — corpus-growth trigram accretion (measured marginal
    // novelty per 10% growth slice).
    "q403_trigram_accretion" -> ((s, d) =>
      DedupOps.trigramAccretion(Tables.documents(s, d), "doc_id",
          "text", 10)
        .orderBy("decile")),

    // L349 — per-Gopher-rule filter selection bias: JS divergence of
    // each rule's survivors vs the corpus (topic-mix resculpting the
    // pass-rate ablation can't see).
    "q404_filter_bias" -> ((s, d) =>
      TextOps.filterBiasAudit(Tables.documents(s, d), "doc_id", "text",
          STOPWORDS)
        .orderBy("rule")),

    // L350 — scalar-quantization similarity fidelity (int4/int8
    // reconstruction cosine vs full precision on candidate pairs).
    "q405_quant_fidelity" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.quantFidelity(emb, "vec_id",
          "embedding", Seq(15, 255),
          signBits = SimilarityOps.adaptiveSignBits(emb))
        .orderBy("level")
    }),

    // L351 — near-dup cluster-size spectrum in power-of-two octaves
    // (the dedup cost-model shape report).
    "q406_cluster_spectrum" -> ((s, d) =>
      DedupOps.clusterSizeSpectrum(Tables.documents(s, d), "doc_id",
          "text")
        .orderBy("octave")),

    // L352 — quantized-index ranking agreement: top-5 overlap of the
    // int4/int8-reconstructed index vs full precision (the retrieval
    // cost of compression, in neighbors not sims).
    "q407_quant_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.quantRecall(emb, "vec_id",
          "embedding", 5, Seq(15, 255),
          signBits = SimilarityOps.adaptiveSignBits(emb))
        .orderBy("level")
    }),

    // L353 — incremental cross-snapshot exact-dedup hit rate per
    // source (prices keeping yesterday's fingerprint store warm).
    "q408_incremental_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      DedupOps.incrementalDedupRate(
          docs.filter(MixtureOps.membership("doc_id") < 0.9),
          docs.filter(MixtureOps.membership("doc_id") >= 0.9),
          "source", "text")
        .orderBy("source")
    }),

    // L354 — duplicate-chunk position profile (is dup mass leading
    // boilerplate, trailing footers, or flat syndication?).
    "q409_dup_position" -> ((s, d) =>
      DedupOps.dupPositionProfile(Tables.documents(s, d), "doc_id",
          "text", 20)
        .orderBy("pos_decile")),

    // L355 — Bloom-filtered incremental dedup FP cost (unique content
    // a constant-memory fingerprint store would falsely drop).
    "q410_bloom_dedup_cost" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      DedupOps.bloomDedupCost(
          docs.filter(MixtureOps.membership("doc_id") < 0.9),
          docs.filter(MixtureOps.membership("doc_id") >= 0.9),
          "source", "text", 256)
        .orderBy("source")
    }),

    // L356 — LSH candidate precision by band-agreement depth (the
    // measured complement of the q338 banding S-curve).
    "q411_candidate_precision" -> ((s, d) =>
      DedupOps.candidatePrecision(Tables.documents(s, d), "doc_id",
          "text", 4, 2, 0.5)
        .orderBy("n_bands")),

    // L357 — chunking-scheme dedup census: fixed windows vs
    // content-defined cuts, family/pair mass per scheme.
    "q412_chunk_scheme_census" -> ((s, d) =>
      TextOps.chunkSchemeCensus(Tables.documents(s, d), "doc_id",
          "text", 20)
        .orderBy("scheme")),

    // L358 — deletion blast radius: deleted docs (3% md5 delete list)
    // whose content survives as a verified near-dup (cluster-delete
    // evidence).
    "q413_deletion_radius" -> ((s, d) =>
      DedupOps.deletionRadius(Tables.documents(s, d), "doc_id",
          "source", "text",
          MixtureOps.saltedMembership("del", "doc_id") >= 0.97, 0.5)
        .orderBy("source")),

    // L359 — confident-learning noise matrix: kNN-consensus predicted
    // label × given label joint (the relabeling triage table).
    "q414_noise_matrix" -> ((s, d) =>
      SimilarityOps.noiseMatrix(Tables.embeddings(s, d), "vec_id",
          "embedding", "label", 5, 4)
        .orderBy("given_label", "predicted_label")),

    // L360 — temporal-split hygiene: entities with activity on both
    // sides of the midpoint boundary, per event type.
    "q415_temporal_split" -> ((s, d) =>
      ExperimentOps.temporalSplitAudit(Tables.events(s, d), "user_id",
          "ts", "event_type")
        .orderBy("event_type")),

    // L361 — leakage-safe split builder: train/eval assigned by
    // near-dup CLUSTER (the fix for q402's finding), achieved eval
    // fraction per source.
    "q416_cluster_split" -> ((s, d) =>
      DedupOps.clusterSplit(Tables.documents(s, d), "doc_id", "source",
          "text", 0.1)
        .orderBy("source")),

    // L362 — ColBERT-style multi-vector MaxSim retrieval over the
    // sign-bucket probe infrastructure (groups of 4 consecutive ids
    // as multi-vector docs).
    "q417_maxsim" -> ((s, d) =>
      SimilarityOps.maxsimRetrieval(Tables.embeddings(s, d), "vec_id",
          "embedding", 4, 3, 4, 10)
        .orderBy("qgroup", "cgroup")),

    // L363 — data-scaling proxy: held-out unigram cross-entropy vs
    // cumulative training slices (measured marginal value of data).
    "q418_scaling_proxy" -> ((s, d) =>
      TextOps.scalingProxy(Tables.documents(s, d), "doc_id", "text", 10)
        .orderBy("train_slices")),

    // L364 — iterative phrase-merge training (word2phrase/BPE loop at
    // token granularity): 5 rounds of count → pick → rewrite; the
    // merge table IS the trained artifact.
    "q419_phrase_merges" -> ((s, d) =>
      TextOps.phraseMerges(Tables.documents(s, d), "text", 5)
        .orderBy("step")),

    // L365 — BFS hop census over the near-dup candidate graph seeded
    // with src0's documents (syndication reach).
    "q420_bfs_hops" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      GraphOps.bfsHops(docs.select(col("doc_id")), "doc_id",
          DedupOps.minhashCandidates(
            DedupOps.minhashSignature(
              DedupOps.shingles(docs, "doc_id", "text"), "doc_id", 4, 2),
            "doc_id", 4, 2),
          "doc_a", "doc_b",
          docs.filter(col("source") === "src0").select(col("doc_id")),
          "doc_id", 3)
        .orderBy("hop")
    }),

    // L366 — source syndication PageRank: sources linked by shared
    // exact-dup content, ranked by the portable PageRank (who
    // originates vs who mirrors).
    "q421_source_pagerank" -> ((s, d) => {
      val hs = Tables.documents(s, d)
        .select(md5(col("text")).as("__h"), col("source")).distinct()
      val edges = hs.join(hs.select(col("__h"),
          col("source").as("__s2")), Seq("__h"))
        .filter(col("source") =!= col("__s2"))
        .select(col("source").as("src"), col("__s2").as("dst"))
        .distinct()
      GraphOps.pageRankPortable(
          Tables.documents(s, d).select(col("source")).distinct(),
          "source", edges, "src", "dst", 3)
        .select(col("node").as("source"), col("rank"))
        .orderBy("source")
    }),

    // L367 — snapshot content-rotation: per-source exact Jaccard of
    // content-fingerprint sets between crawls (corpusDelta's
    // content-keyed twin).
    "q422_snapshot_rotation" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      DedupOps.snapshotRotation(
          docs.filter(MixtureOps.membership("doc_id") < 0.9),
          docs.filter(MixtureOps.membership("doc_id") >= 0.1),
          "source", "text")
        .orderBy("source")
    }),

    // L368 — MMR diversified rerank of the ANN top-5 (λ = 0.5, 3
    // greedy rounds unrolled; redundancy out of the result list;
    // candidates from the count-stepped adaptive bucket width).
    "q423_mmr_rerank" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      SimilarityOps.mmrRerank(emb, "vec_id",
          "embedding", 5, 3, SimilarityOps.adaptiveSignBits(emb))
        .orderBy("vec_id", "rank")
    }),

    // L369 — COEC position-bias correction per event type (clicks
    // over position-expected clicks; props.k as the slate position).
    "q424_coec" -> ((s, d) =>
      RetrievalOps.positionCoec(Tables.events(s, d), "event_type",
          get_json_object(col("props"), "$.k").cast("long"),
          col("value") > CLICK_THRESHOLD)
        .orderBy("segment")),

    // L370 — degree assortativity of the near-dup candidate graph
    // (template network vs hub-and-mirror topology).
    "q425_assortativity" -> ((s, d) =>
      GraphOps.assortativity(
        DedupOps.minhashCandidates(
          DedupOps.minhashSignature(
            DedupOps.shingles(Tables.documents(s, d), "doc_id", "text"),
            "doc_id", 4, 2),
          "doc_id", 4, 2), "doc_a", "doc_b")),

    // L371 — end-to-end corpus-build manifest: Gopher gate →
    // cluster-atomic split → per-source packing at budget 256 (this
    // round's ops composed into the table a training run reads).
    "q426_corpus_build" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pass = TextOps.gopherFlags(docs, "doc_id", "text", STOPWORDS,
          keep = Seq("source", "text"))
        .filter(col("f_word_count") + col("f_mean_word_len") +
          col("f_top_word_share") + col("f_no_stopword") +
          col("f_distinct_ratio") === 0)
        .select("doc_id", "source", "text")
      val cc = GraphOps.connectedComponents(docs.select(col("doc_id")),
        "doc_id",
        DedupOps.minhashCandidates(
          DedupOps.minhashSignature(
            DedupOps.shingles(docs, "doc_id", "text"), "doc_id", 4, 2),
          "doc_id", 4, 2), "doc_a", "doc_b")
      val lab = pass
        .join(cc.select(col("node").as("doc_id"), col("label")),
          Seq("doc_id"))
        .withColumn("__ev",
          (MixtureOps.membership("label") >= 0.9).cast("long"))
      val packed = TextOps.packSequences(lab.filter(col("__ev") === 0),
        "source", "doc_id", "text", 256L)
      val evc = lab.groupBy(col("source"))
        .agg(count(lit(1)).as("n_pass"), sum(col("__ev")).as("n_eval"))
      packed.groupBy(col("source"))
        .agg(count(lit(1)).as("n_bins"),
          sum(col("n_tokens")).as("n_train_tokens"))
        .join(evc, Seq("source"))
        .select(col("source"), col("n_pass"),
          (col("n_pass") - col("n_eval")).as("n_train"), col("n_eval"),
          col("n_bins"), col("n_train_tokens"),
          expr("CAST((n_train_tokens * 2000000 + n_bins * 256) " +
            "div (2 * n_bins * 256) AS BIGINT)").as("fill_ppm"))
        .orderBy("source")
    }),

    // L372 — hashing-trick collision audit for the (type × user-
    // bucket) feature cross (pick the smallest width the model can
    // absorb).
    "q427_hash_collisions" -> ((s, d) =>
      EncodeOps.hashCollisionAudit(
          Tables.events(s, d)
            .withColumn("user_bucket", expr("user_id div 10")),
          Seq("event_type", "user_bucket"), Seq(8, 12, 16))
        .orderBy("bits")),

    // L373 — per-source quality-threshold transfer (quantile-matched
    // min-length cutoffs; the disparate-impact fix for one global
    // threshold).
    "q428_threshold_transfer" -> ((s, d) =>
      TextOps.thresholdTransfer(Tables.documents(s, d), "source",
          "text", 30)
        .orderBy("source")),

    // L374 — AMS F2 sketch vs the exact second moment of the token
    // frequency vector (the self-join-size estimator, deterministic
    // md5 signs so the estimate itself is oracle-checked).
    "q429_ams_f2" -> ((s, d) =>
      SketchOps.amsF2(
        Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("token")),
        "token", 8)),

    // L375 — cross-crawl reciprocal best match: the id-remap census
    // (page identity across snapshots via mutual best near-dup).
    "q430_best_match" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      DedupOps.reciprocalBestMatch(
          docs.filter(MixtureOps.membership("doc_id") < 0.9),
          docs.filter(MixtureOps.membership("doc_id") >= 0.9),
          "doc_id", "source", "text")
        .orderBy("source")
    }),

    // L376 — decision-stump split finder: best integer threshold on
    // props.k for the value>100 label (the CART inner loop as one
    // histogram pass).
    "q431_stump_split" -> ((s, d) =>
      MetricOps.stumpSplit(Tables.events(s, d),
        get_json_object(col("props"), "$.k").cast("long"),
        (col("value") > CLICK_THRESHOLD).cast("long"))),

    // §7.1 FLAGSHIP — the end-to-end recommend: recall-bounded term +
    // kNN channels (es_caller.py:42 size=200), hybrid 0.1/0.9 union,
    // seen anti-filter, serving-snapshot PIT rank, top-k response.
    // The one composed artifact the reference's online path serves,
    // declared so every stage is hash-checked.
    "q432_flagship_recommend" -> ((s, d) => Flagship.recommend(s, d)),

    // L280 — tokenizer APPLICATION: the q419-trained phrase merges
    // applied to the corpus in one row-local projection; per-source
    // token counts before/after + exact half-up compression ppm (the
    // "what does the trained vocabulary buy" report).
    "q433_phrase_apply" -> ((s, d) =>
      TextOps.phraseApply(Tables.documents(s, d), "source", "text", 5)
        .orderBy("source")),

    // L281 — cross-method near-dup agreement census: exact-dup vs
    // MinHash-verified Jaccard >= 1/2 (integer cross-multiplied) vs
    // SimHash Hamming <= 3 pair universes, one row per flag combo —
    // which detector finds what.
    "q434_dedup_method_census" -> ((s, d) =>
      DedupOps.dedupMethodCensus(Tables.documents(s, d), "doc_id",
          "text")
        .orderBy(col("exact_dup").desc, col("minhash_j05").desc,
          col("simhash_h3").desc)),

    // L283 — scale-ADAPTIVE multi-probe ANN top-3: the sign-bucket
    // width follows corpus size on the per-4× stepped schedule (+2
    // bits at 1e3/4e3/16e3/64e3/256e3/1.024e6 vectors, 16-bit cap —
    // the round-10 BENCHLOG dial that pins the mean cell at ~16
    // vectors), so the same declared query exercises DIFFERENT bucket
    // geometries across the three gate SFs (500 → 4 bits, 2000 → 6).
    "q436_ann_adaptive" -> ((s, d) =>
      SimilarityOps.annTopKAdaptive(Tables.embeddings(s, d), "vec_id",
          "embedding", 3)
        .orderBy("vec_id", "neighbor_id")),

    // L285 — measured recall of the ADAPTIVE-width ANN (q436's safety
    // certificate): the q397 audit machinery at the corpus's own
    // bucket width, per probe level H<=0/1/2, vs the 1-in-20-sampled
    // exact ground truth.
    "q438_ann_adaptive_recall" -> ((s, d) =>
      SimilarityOps.annRecallAuditAdaptive(Tables.embeddings(s, d),
          "vec_id", "embedding", 5, 20)
        .orderBy("level")),

    // L286 — the quantizer UPGRADE q438 motivates: the same adaptive
    // recall audit with SRP hyperplane buckets (md5-seeded planes mix
    // all 64 dims) instead of leading-dim signs — the q438→q439 recall
    // gap at equal width and probe level is the measured value of a
    // better coarse quantizer.
    "q439_ann_srp_recall" -> ((s, d) =>
      SimilarityOps.annRecallAuditSrpAdaptive(Tables.embeddings(s, d),
          "vec_id", "embedding", 5, 20)
        .orderBy("level")),

    // L284 — flagship nDCG@3 under the same leave-one-out protocol:
    // single relevant item → per-user nDCG = gain at the hit rank,
    // with the rank gains 1/log2(1+r) pinned as INTEGER ppm literals
    // (1000000, 630930, 500000) so both engines sum identical ints —
    // no transcendental ever evaluates. Also reports hits by rank.
    "q437_flagship_ndcg" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      val base = ev.withColumn("__r", row_number().over(w))
      val hist = base.filter(col("__r") > 1).drop("__r")
      val test = base.filter(col("__r") === 1)
        .select(col("user_id"), col("event_type").as("test_item"))
      val resp = Flagship.recommendFrom(s, hist, Tables.embeddings(s, d))
        .withColumn("rn", row_number().over(Window.partitionBy("user_id")
          .orderBy(col("rank_ppm").desc, col("recall_ppm").desc,
            col("item"))))
      val gain = expr("CASE rn WHEN 1 THEN 1000000L WHEN 2 THEN 630930L " +
        "ELSE 500000L END")
      val perUser = resp.join(test, "user_id")
        .groupBy(col("user_id"))
        .agg(max(when(col("item") === col("test_item"), gain)
            .otherwise(0L)).as("g"),
          max(when(col("item") === col("test_item"), col("rn"))
            .otherwise(0)).as("hr"))
      perUser.agg(count(lit(1)).as("n_users"),
          sum(when(col("hr") === 1, 1L).otherwise(0L)).as("hits_at_1"),
          sum(when(col("hr") === 2, 1L).otherwise(0L)).as("hits_at_2"),
          sum(when(col("hr") === 3, 1L).otherwise(0L)).as("hits_at_3"),
          sum(col("g")).as("__sg"))
        .select(col("n_users"), col("hits_at_1"), col("hits_at_2"),
          col("hits_at_3"),
          expr("CAST((__sg * 2 + n_users) div (2 * n_users) AS BIGINT)")
            .as("ndcg_ppm"))
    }),

    // L282 — flagship OFFLINE EVAL: leave-one-out hit-rate/MRR@3 —
    // each user's last event held out, the q432 pipeline re-run on the
    // history only, the held-out item scored against the response
    // list. Exact integer ppm (1e6 div rank reciprocal ranks).
    "q435_flagship_loo_eval" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      val base = ev.withColumn("__r", row_number().over(w))
      val hist = base.filter(col("__r") > 1).drop("__r")
      val test = base.filter(col("__r") === 1)
        .select(col("user_id"), col("event_type").as("test_item"))
      val resp = Flagship.recommendFrom(s, hist, Tables.embeddings(s, d))
        .withColumn("rn", row_number().over(Window.partitionBy("user_id")
          .orderBy(col("rank_ppm").desc, col("recall_ppm").desc,
            col("item"))))
      val perUser = resp.join(test, "user_id")
        .groupBy(col("user_id"))
        .agg(max(when(col("item") === col("test_item"), 1L)
            .otherwise(0L)).as("hit"),
          max(when(col("item") === col("test_item"),
            expr("CAST(1000000 div rn AS BIGINT)"))
            .otherwise(0L)).as("rr"))
      perUser.agg(count(lit(1)).as("n_users"),
          sum(col("hit")).as("n_hits"), sum(col("rr")).as("__sr"))
        .select(col("n_users"), col("n_hits"),
          expr("CAST((n_hits * 2000000 + n_users) div (2 * n_users) " +
            "AS BIGINT)").as("hit_rate_ppm"),
          expr("CAST((__sr * 2 + n_users) div (2 * n_users) " +
            "AS BIGINT)").as("mrr_ppm"))
    }),

    // L377 — TRAINED IVF coarse quantizer, exact integer Lloyd over an
    // md5-SAMPLED training slice (~32·kCent vectors via ivfSampleMod,
    // so each Lloyd round costs ∝ kCent² ∝ n — the round-11 fix for
    // the flat trainer's measured n^1.5): md5 seeds, 2 rounds over
    // ppm-quantized embeddings (BIGINT sums + exact floor-division
    // means, so the trained codebook is bit-reproducible
    // cross-engine), census per surviving cell OVER THE SLICE: member
    // count, centroid L1 mass, the last round's L1 shift (the
    // convergence signal). kCent rides the count-stepped width
    // schedule (2^(bits/2+1): 8 at 500 vectors, 16 at 2000); the
    // sample modulus is 1 below ~256·kCent vectors (sf0.001/sf0.01)
    // and 3 at sf0.1, so the gates pin both regimes.
    "q440_ivf_train" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val n = emb.count()
      val kc = 1 << (SimilarityOps.signBitsForCount(n) / 2 + 1)
      SimilarityOps.ivfTrain(emb, "vec_id", "embedding", kc,
        sampleMod = SimilarityOps.ivfSampleMod(n, kc))
    }),

    // L378 — ANN top-5 over the TRAINED quantizer, SHARDED layout (the
    // round-11 migration off the flat form, whose full-corpus n·kCent
    // assignment measured ×10.5 at 10× data): shardBits leading sign
    // bits partition the corpus (shards ∝ n under the count schedule),
    // each shard trains its OWN exact-integer codebook of FIXED
    // kcPerShard cells, and every assignment/probe is an equi-join on
    // the shard id — n·kcPerShard distance rows per sweep and a
    // bounded mean cell at ANY corpus size. Search is shard-local (the
    // IMI trade). Round-12 dials = q452's sweep winner: shardBits =
    // max(1, bits − 5), kcPerShard = 16, nprobe = 8 — measured 47.4%
    // recall@5 vs the flat layout's 48.2% (0.98×) at 1.34× its
    // candidate budget (sf0.1), closing the 40-45% relative recall
    // hole q449 measured at the round-11 dials (sb = bits−4, kc 8,
    // nprobe 2) while keeping every cost linear: assignment n·16,
    // ~8·cell ≈ 500 candidates/query, constant in n.
    "q441_ivf_ann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val sb = math.max(1, SimilarityOps.adaptiveSignBits(emb) - 5)
      SimilarityOps.ivfAnnTopKSharded(emb, "vec_id", "embedding", 5,
          kcPerShard = 16, nprobe = 8, rounds = 2, shardBits = sb)
        .orderBy("vec_id", "neighbor_id")
    }),

    // L379 — corpus-INTERNAL duplicated-substring census (the Lee
    // et al. 2022 exact-substring dedup signal): 5-gram occurrences
    // seen ≥2 times anywhere in the corpus, merged per doc into
    // maximal OVERLAP-aware spans (islands at gap ≤ 4, so the token
    // coverage is the exact interval union, never > doc length);
    // per-doc span count, longest span, covered tokens, ppm load.
    "q442_dupsubstr_census" -> ((s, d) =>
      DedupOps.dupSubstringCensus(Tables.documents(s, d), "doc_id",
          "text", 5)
        .orderBy("doc_id")),

    // L380 — exact-substring EXCISION decision table: a 5-gram
    // occurrence is redundant iff it is not the corpus-global FIRST
    // occurrence (min (doc, pos) keeper — deterministic cross-engine);
    // redundant positions merge into per-doc interval-union spans and
    // roll up per source to the tokens a substring-dedup pass would
    // remove — the before/after budget such a run is approved on.
    "q443_dupsubstr_excise" -> ((s, d) =>
      DedupOps.dupSubstringExcise(Tables.documents(s, d), "doc_id",
          "text", "source", 5)
        .orderBy("source")),

    // L381 — measured recall certificate for the TRAINED quantizer
    // (q440/q441's safety audit, the q438/q439 shape): recall@5 per
    // nprobe 1/2/3 vs the 1-in-20-sampled exact ground truth. Read
    // next to q438/q439, it measures whether density-adapted cells
    // beat the data-independent sign planes at equal candidate cost.
    // Round 12: the Lloyd rounds train on the q440 md5-sampled
    // ~32·kCent slice (the certificate needs a REPRESENTATIVE
    // codebook, not one trained on every row) — only the single home
    // assignment and the declared-quadratic exact side still sweep
    // the corpus.
    "q444_ivf_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val n = emb.count()
      val kc = 1 << (SimilarityOps.signBitsForCount(n) / 2 + 1)
      SimilarityOps.ivfRecallAudit(emb, "vec_id", "embedding", 5, kc,
          trainMod = SimilarityOps.ivfSampleMod(n, kc))
        .orderBy("nprobe")
    }),

    // L382 — substring PROVENANCE matrix: for every redundant 5-gram
    // occurrence one (origin, copier) edge, origin = the source
    // holding the corpus-global first occurrence (the q443 keeper).
    // Row-heavy sources originate, column-heavy ones mirror — the
    // DIRECTED, substring-granular sibling of q421's syndication
    // graph; boilerplate and partial copies show here that whole-doc
    // fingerprints never see. Linear in occurrences, never pairwise.
    "q445_dupsubstr_provenance" -> ((s, d) =>
      DedupOps.dupSubstringProvenance(Tables.documents(s, d), "doc_id",
          "text", "source", 5)
        .orderBy("src_from", "src_to")),

    // L383 — substring-length survival LADDER (the "choose L" table a
    // substring-dedup run is tuned on): per candidate gram length
    // n ∈ {3,5,7,9,25}, the corpus-level excision outcome — dup grams,
    // docs touched, tokens the keeper excision removes, retention
    // ppm. Short n over-excises, long n under-detects; the knee is
    // corpus-specific and this is the q338/q339-style knob report
    // that finds it. The n = 25 rung (half Lee et al.'s L = 50; these
    // docs cap at ~100 tokens) is what the md5-fingerprint shuffle key
    // makes affordable — 16 bytes per occurrence at any L.
    "q446_dupsubstr_ladder" -> ((s, d) =>
      DedupOps.dupSubstringLadder(Tables.documents(s, d), "doc_id",
          "text")
        .orderBy("n")),

    // L384 — gram multiplicity SPECTRUM: octave histogram of per-gram
    // occurrence counts (octave 0 = unique). The heavy high-octave
    // tail is the boilerplate mass dedup must handle — the Σ bucket²
    // blow-up the banding design notes cite, read directly off the
    // corpus.
    "q447_gram_spectrum" -> ((s, d) =>
      DedupOps.gramMultiplicitySpectrum(Tables.documents(s, d),
          "doc_id", "text", 5)
        .orderBy("octave")),

    // L385 — SHARDED trained-IVF ANN (the IMI-style 100 TB layout of
    // q441): 4 leading sign bits partition the corpus into 16 shards,
    // each shard trains its OWN exact-integer codebook, and every
    // assignment/probe is an equi-join on the shard id — the flat
    // form's n·kCent broadcast sweep becomes n·kcPerShard with a
    // bounded per-shard codebook at any corpus size. Search is
    // shard-local (the standard IMI recall trade, measured per corpus
    // the q444 way). (Demoted to an IvfSpec fixture by r12's VERDICT,
    // restored in round 14: a declared query may not drop between
    // rounds. The IvfSpec checksum pin stays as a second guard.)
    "q448_ivf_sharded_ann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val kc = math.max(2,
        (1 << (SimilarityOps.adaptiveSignBits(emb) / 2 + 1)) / 4)
      SimilarityOps.ivfAnnTopKSharded(emb, "vec_id", "embedding", 5, kc)
        .orderBy("vec_id", "neighbor_id")
    }),

    // L386 — measured recall certificate for the SHARDED trained
    // quantizer (the IMI shard-locality trade the round-10 sharded ANN
    // named but never measured): recall@5 per own-shard nprobe 1/2/3
    // at the ROUND-11 default dials (shardBits = max(2, bits − 4), 8
    // cells per shard) vs the 1-in-20-sampled exact ground truth over
    // the FULL corpus — cross-shard true neighbors count AGAINST
    // recall, so the gap to q444's flat numbers is the measured price
    // of sharding at those dials (13-23% vs 19-42%). Kept at the OLD
    // dials deliberately: this is the "before" row of the q452 dial
    // sweep, whose winner (bits−5, kc 16, nprobe 8 → 47.4% vs flat
    // 48.2%) is what q441 now ships. Declared-cartesian whitelist
    // class (sampled exact baseline), like q397/q438/q439/q444.
    "q449_ivf_sharded_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val sb = math.max(2, SimilarityOps.adaptiveSignBits(emb) - 4)
      SimilarityOps.ivfRecallAuditSharded(emb, "vec_id", "embedding", 5,
          kcPerShard = 8, shardBits = sb)
        .orderBy("nprobe")
    }),

    // L387 — recall-per-CANDIDATE table: sign buckets vs the trained
    // IVF at IDENTICAL geometry (2^bits cells each), both probed at
    // their three levels against ONE shared 1-in-20-sampled exact
    // ground truth, every row carrying the DISTINCT candidate pairs
    // that level examined next to its recall — the q438-vs-q444
    // comparison normalized to candidate cost (the SURVEY §2.11
    // index-design question: does density adaptation beat
    // data-independent planes on this corpus?). Declared-cartesian
    // whitelist class (the one shared sampled exact side). Round 12:
    // the audit runs on a BOUNDED ~1000-vector md5-sampled dev slice
    // (geometry from the slice count) — at equal geometry
    // kCent = 2^bits rides ∝ n, so 32·kCent ≥ n at every size and the
    // q440 trainer-sampling can never fire; the dev-slice bound is the
    // only shape that keeps this audit's cost constant in n (it was
    // the one ∝ n² declared plan, ×80.5 at 10× data in round 11).
    "q450_recall_per_candidate" -> ((s, d) =>
      SimilarityOps.recallPerCandidateAudit(Tables.embeddings(s, d),
        "vec_id", "embedding", 5)),

    // L388 — negative sampling WITHOUT the broadcastable-catalog
    // assumption (q109's 100 TB form, same seen/catalog tables): a
    // bounded per-user md5 SLOT draw with hash rejection — 40
    // slots/user each propose item id md5(user|slot) mod (max id + 1),
    // rejected on catalog miss, seen hit, or repeat; the first 5
    // survivors (slot order) win. |U|·40 generated rows + equi-joins
    // only; PlanAuditSpec asserts the executed plan is BNLJ- and
    // cartesian-free — q109's exact top-n-by-pair-hash semantic
    // inherently streams |U|·|C| (a per-user MIN over the catalog),
    // this draw's cost is independent of |C|.
    "q451_negsample_rejection" -> ((s, d) => {
      val seen = Tables.orders(s, d).filter(col("o_custkey") < 200)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("custkey"), col("l_partkey").as("partkey"))
      val catalog = Tables.part(s, d).filter(col("p_partkey") < 500)
        .select(col("p_partkey").as("partkey"))
      RetrievalOps.negativeSampleRejection(seen, catalog, "custkey",
          "partkey", 5)
        .orderBy("custkey", "partkey")
    }),

    // L389 — sharded-IVF recall-DIAL sweep: the certificate that buys
    // back q449's measured IMI shard-locality loss (13-23% vs flat
    // 19-42% at q441's round-11 defaults). Grid = shardBits ∈
    // {bits−4, bits−5 (floored)} × kcPerShard ∈ {8,16,32} × own-shard
    // nprobe ∈ {2,4,8}, every dial vs ONE shared 1-in-20 exact ground
    // truth over the FULL corpus (cross-shard misses count against
    // recall, as in q449), each row reporting the DISTINCT candidate
    // pairs that dial examined (the q450 discipline) — so "flat
    // recall at bounded candidates" is a read-off. Flat reference rows
    // (q444 geometry, q440 sampled trainer) ride along with their own
    // candidate budget. This table is what moved q441's defaults to
    // (bits−5, kc 16, nprobe 8): 47.4% vs flat 48.2% recall@5 at
    // 506-vs-378 candidates (sf0.1) — and its shard-exhaustive row
    // (sb=1, kc 8, np 8 → 57.4%) reproduces the independently measured
    // own-shard ceiling exactly. ES analogue: the explicit
    // k/num_candidates tuning in s2_item_to_es.py:85-90.
    "q452_ivf_dial_sweep" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val n = emb.count()
      val bits = SimilarityOps.signBitsForCount(n)
      val flatKc = 1 << (bits / 2 + 1)
      SimilarityOps.ivfDialSweep(emb, "vec_id", "embedding", 5,
        flatKc, SimilarityOps.ivfSampleMod(n, flatKc),
        Seq(math.max(2, bits - 4), math.max(1, bits - 5)),
        Seq(8, 16, 32), Seq(2, 4, 8))
    }),

    // L390 — sharded-IVF SERVING twin (the 100 TB online-recall
    // shape): train the q441-dial index once, freeze codebook + home
    // assignment, then answer a 1-in-10 md5-sampled request stream of
    // query vectors — route to shard, probe nprobe own-shard cells,
    // exact cosine, top-5. Per-request cost kcPerShard + nprobe·cell,
    // independent of corpus size. StreamingIvfServeSpec drives the
    // SAME search core per rate-limited micro-batch and asserts row
    // parity with this declared batch plan (stream ≡ batch, the DSIR
    // scorer discipline).
    "q453_ivf_serve" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val sb = math.max(1, SimilarityOps.adaptiveSignBits(emb) - 5)
      SimilarityOps.ivfServeSharded(emb, "vec_id", "embedding", 5,
          kcPerShard = 16, nprobe = 8, rounds = 2, shardBits = sb,
          queryMod = 10)
        .orderBy("vec_id", "neighbor_id")
    }),

    // L388 — REAL-codec image statistics (the multimodal pillar's
    // pixel-native declared query): per doc an md5-seeded BMP (even
    // ids; half top-down; stride padding at w ∈ {5,6,7}) or PPM (odd
    // ids; header comment; maxval-63 rescale on a third) is
    // serialized, decoded by MultimodalOps.ImageDecoder IN-PLAN, and
    // reduced to integer raster statistics incl. x/y-weighted luma
    // sums (the orientation canary). Map-only until the sort; the
    // oracle mirrors the DECODED pixels closed-form, so any codec
    // defect (row order, padding, rescale, header parse) is a hash
    // mismatch. Reference analogue: the modality-blind ES
    // dense-vector index (offline_to_online/recall/s2_item_to_es
    // .py:36-41) — pixels are the capability the reference outsources.
    "q454_image_decode_stats" -> ((s, d) =>
      MultimodalOps.imageDecodeStats(Tables.documents(s, d), "doc_id")
        .orderBy("doc_id")),

    // L389 — perceptual-hash image NEAR-dup (multimodal dedup, the
    // Lee-et-al. question asked of rasters): md5-cluster-seeded 8×8
    // BMPs whose siblings differ by a bounded pixel inversion, REAL
    // codec decode in-plan, integer 64-bit aHash as two 32-bit halves,
    // banded 16-bit Hamming-bucket EQUI-joins (4 bands, any clean band
    // collides) + bit_count(xor) verify ≤ 6. Cluster count scales with
    // n (docsPerCluster = 16), so candidates stay linear — never
    // all-pairs. The q396 bit-packing machinery pointed at pixels.
    "q455_image_phash_neardup" -> ((s, d) =>
      MultimodalOps.imagePhashNearDup(Tables.documents(s, d), "doc_id")
        .orderBy("doc_a", "doc_b")),

    // L390 — VIDEO-shape frame sampling as a declared query: the
    // payload rides as real binary, MultimodalOps.frameSample slices
    // every 3rd fixed 8-byte frame column-side (codegen'd
    // sequence/filter/transform — partial trailing frames dropped,
    // sub-frame payloads yield zero rows), and each kept frame is
    // fingerprinted with md5 over its BYTES. Docs are ASCII, so the
    // DuckDB twin mirrors the same slices as VARCHAR substrings (the
    // oracle-side equivalence the gate rests on). Map-only until the
    // sort; shuffle volume is fingerprint width, never payload width.
    "q456_frame_sample" -> ((s, d) =>
      MultimodalOps.frameSample(
          Tables.documents(s, d)
            .withColumn("payload", encode(col("text"), "UTF-8")),
          "payload", frameBytes = 8, stride = 3)
        .select(col("doc_id"),
          posexplode(col("frames")).as(Seq("pos", "frame")))
        .select(col("doc_id"),
          (col("pos") * 3).cast("int").as("frame_idx"),
          md5(col("frame")).as("frame_md5"))
        .orderBy("doc_id", "frame_idx")),

    // L391 — AUDIO modality: md5-seeded RIFF/WAV PCM16 payloads (mono/
    // stereo, 8/16 kHz, half with an odd-size LIST chunk before data)
    // serialized AND decoded by the REAL chunk-walking codec in-plan,
    // reduced to integer clip statistics (sum/max |v|, energy, strict
    // sign-change zero crossings). The oracle recomputes the DECODED
    // samples closed-form — any codec defect (chunk walk, pad byte,
    // s16 LE sign, fmt parse) is a hash mismatch. With q454-q456 this
    // makes the multimodal pillar pixel-, frame- AND sample-native.
    "q457_audio_decode_stats" -> ((s, d) =>
      MultimodalOps.audioDecodeStats(Tables.documents(s, d), "doc_id")
        .orderBy("doc_id"))
  )

  // ------------------------------------------------------------- oracles

  def oracleSql: Map[String, String] = OracleSql.all
}
