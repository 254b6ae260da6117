package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Physical-plan contracts at sf0.001 — the properties that make these
  * plans survive a 100× scale-up, asserted so they can't silently rot:
  * scan pushdown, dimension broadcast, bounded exchange counts.
  */
class PlanAuditSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)

  private def shuffles(df: DataFrame): Seq[ShuffleExchangeLike] = {
    df.count()   // let AQE finalize
    collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: ShuffleExchangeLike => s
    }
  }

  test("q01: filters and projection are pushed into the parquet scan") {
    val s = plan("q01_scan_filter_project").queryExecution.executedPlan.toString
    assert(s.contains("PushedFilters") && s.contains("GreaterThan(l_quantity"))
    assert(s.contains("ReadSchema") && !s.contains("l_shipdate"),
      "projection must prune unused columns from the scan")
  }

  test("q07: both dimension joins broadcast (no shuffle joins)") {
    val df = plan("q07_left_join")
    df.count()
    val bhj = collectWithSubqueries(df.queryExecution.executedPlan) {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj.length == 2, s"expected 2 broadcast joins, got ${bhj.length}")
  }

  test("q10: PIT window costs exactly one hash exchange (plus the final sort)") {
    val ex = shuffles(plan("q10_pit_window"))
    // one hashpartitioning for the window + one rangepartitioning for ORDER BY
    assert(ex.length <= 2, s"unexpected exchanges: ${ex.map(_.outputPartitioning)}")
    assert(ex.exists(_.outputPartitioning.toString.contains("hashpartitioning")))
  }

  test("q39: faithful term PIT still shuffles only on (user, term) + final sort") {
    val ex = shuffles(plan("q39_pit_term_window"))
    assert(ex.length <= 2, s"unexpected exchanges: ${ex.map(_.outputPartitioning)}")
  }

  test("q25: distributed AUC never funnels the fact table through one partition") {
    val ex = shuffles(plan("q25_auc_sql"))
    // The rank work must be hash-partitioned; a SinglePartition exchange
    // is legitimate only as the final scalar-aggregate merge (its child
    // is a partial HashAggregate carrying 3 longs per partition).
    assert(ex.exists(_.outputPartitioning.toString.contains("hashpartitioning")),
      "per-score rank window must hash-partition the fact table")
    val badSingles = ex.filter(s => s.outputPartitioning.numPartitions == 1 &&
      !s.child.toString.contains("HashAggregate"))
    assert(badSingles.isEmpty,
      s"non-aggregate single-partition exchange: $badSingles")
  }

  test("q43: as-of join is one key shuffle + final sort, no join explosion") {
    val ex = shuffles(plan("q43_asof_join"))
    assert(ex.length <= 3, s"unexpected exchanges: ${ex.map(_.outputPartitioning)}")
  }

  test("q46: temporal RANGE window costs one hash exchange + final sort") {
    val ex = shuffles(plan("q46_time_range_window"))
    assert(ex.length <= 2, s"unexpected exchanges: ${ex.map(_.outputPartitioning)}")
    assert(ex.exists(_.outputPartitioning.toString.contains("hashpartitioning")))
  }

  test("q29: near-dup candidates join on the banded MinHash key, not a global min-hash") {
    val df = plan("q29_lsh_jaccard")
    df.count()
    val s = df.queryExecution.executedPlan.toString
    // the candidate equi-join keys on the melted (band, key) pair — the
    // bucket-bounding property that prevents the mega-bucket blowup
    assert("band#\\d+(L)?, key#\\d+".r.findFirstIn(s).isDefined,
      "candidate join must key on the banded (band, key) signature")
  }

  test("q60: bucketed near-dup joins on the probe cell id — no all-pairs join") {
    val df = plan("q60_embedding_neardup_bucketed")
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct"), "q60 must never plan a cross join")
    assert("bucket#\\d+".r.findFirstIn(s).isDefined,
      "candidate join must key on the sign-bucket cell id")
  }

  test("q85: the region-nation dim chain broadcasts onto the fact joins") {
    val df = plan("q85_region_revenue")
    df.count()
    val bhj = collectWithSubqueries(df.queryExecution.executedPlan) {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty, "snowflake dims must broadcast, not shuffle")
  }

  test("q100: native as-of join plans AsOfJoinExec — 2 key exchanges, no window") {
    val df = plan("q100_asof_exec")
    df.count()
    val s = df.queryExecution.executedPlan
    assert(collectWithSubqueries(s) {
      case e: graft.plans.AsOfJoinExec => e
    }.length == 1, "expected exactly one AsOfJoinExec")
    assert(collectWithSubqueries(s) { case w: WindowExec => w }.isEmpty,
      "the exec form must not fall back to the window twin")
    val hashEx = shuffles(df).filter(
      _.outputPartitioning.toString.contains("hashpartitioning"))
    assert(hashEx.length == 2,
      s"as-of join must cost one key exchange per side, got ${hashEx.length}")
  }

  test("q98: chunk dedup is one window shuffle + one doc regroup, no self-join") {
    val df = plan("q98_chunk_dedup")
    assert(!df.queryExecution.executedPlan.toString.contains("Join"),
      "chunk dedup must be window+regroup, never a join")
    assert(shuffles(df).length <= 3,
      "chunk-hash window, doc regroup, final sort — nothing else")
  }

  test("q99: mixture rates join the corpus by broadcast, never a data shuffle") {
    val df = plan("q99_mixture_sample")
    df.count()
    val bhj = collectWithSubqueries(df.queryExecution.executedPlan) {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty, "per-source rates must broadcast onto the corpus scan")
  }

  test("q102: BM25 broadcasts df/corpus stats; the doc scan never re-shuffles for them") {
    val df = plan("q102_bm25")
    df.count()
    val bhj = collectWithSubqueries(df.queryExecution.executedPlan) {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty, "per-term df table must broadcast onto the tf stream")
  }

  test("q108: the shipdate filter reaches the lineitem scan") {
    val s = plan("q108_tpch_q1").queryExecution.executedPlan.toString
    assert(s.contains("PushedFilters") && s.contains("LessThanOrEqual(l_shipdate"))
  }

  test("q110: i2i margin counts broadcast back onto the pair stream") {
    val df = plan("q110_i2i_pmi")
    df.count()
    val bhj = collectWithSubqueries(df.queryExecution.executedPlan) {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj.size >= 2, s"both margins must broadcast, got ${bhj.size}")
  }

  test("q119: the CMS sketch broadcasts onto the probe — never the reverse") {
    val df = plan("q119_cms_heavy_hitters")
    df.count()
    val bhj = collectWithSubqueries(df.queryExecution.executedPlan) {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty, "sketch-probe join must be a broadcast hash join")
  }

  test("q124: the Bloom filter words broadcast to the probe side") {
    val df = plan("q124_bloom_membership")
    df.count()
    val bhj = collectWithSubqueries(df.queryExecution.executedPlan) {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty, "filter-word join must be a broadcast hash join")
  }

  test("q130: Q6 predicates reach the lineitem scan and prune its schema") {
    // PushedFilters renders truncated in plan strings — assert the scan
    // carries pushed filters at all, and that ReadSchema keeps only the
    // 4 referenced columns (no l_orderkey → projection pruned).
    val s = plan("q130_tpch_q6").queryExecution.executedPlan.toString
    assert(s.contains("PushedFilters: [IsNotNull(l_shipdate)"))
    assert(s.contains("ReadSchema") && !s.contains("l_orderkey"))
  }

  test("q126: dyadic decay is one aggregation — no window, no extra shuffles") {
    val df = plan("q126_decayed_popularity")
    df.count()
    val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
      case w: WindowExec => w
    }
    assert(wins.isEmpty, "decay must not use a window")
    // key hash agg + scalar max(ts) merge + final top-N ordering
    assert(shuffles(df).length <= 3)
  }

  test("q123: containment candidates pass the rarest-first prefix filter, not the raw inverted index") {
    val df = plan("q123_containment_join")
    df.count()
    val s = df.queryExecution.executedPlan.toString
    // the a-side of the candidate join must be prefix-restricted: a
    // row_number position (__pos) bounded by the pigeonhole prefix
    // length. A raw shingle-index self-join has no such filter and
    // explodes quadratically on hot boilerplate shingles.
    assert("__pos#\\d+".r.findFirstIn(s).isDefined,
      "candidate a-side must rank shingles rarest-first (__pos missing)")
    assert("(?i)ceil".r.findFirstIn(s).isDefined &&
        "__pos#\\d+[^\\n]*<=".r.findFirstIn(s).isDefined,
      "candidate a-side must filter to the pigeonhole prefix length")
  }

  test("q136: all four Bloom word probes broadcast; the fact side never shuffles for them") {
    val df = plan("q136_bloom_prefilter_join")
    df.count()
    val bhj = collectWithSubqueries(df.queryExecution.executedPlan) {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj.size >= 4,
      s"expected >= 4 broadcast word-probe joins, got ${bhj.size}")
  }

  test("q134: interval candidates join on the (key, bin) grid key") {
    val df = plan("q134_interval_overlap")
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert("__bin#\\d+".r.findFirstIn(s).isDefined,
      "candidate join must key on the grid bin")
  }

  test("q137: EXISTS plans as a semi join, never a full join + distinct") {
    val df = plan("q137_tpch_q4")
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("LeftSemi"), "late-shipment EXISTS must stay a semi join")
  }

  test("q141: OR-of-ANDs keeps the part dim broadcast and prunes the lineitem scan") {
    val df = plan("q141_tpch_q19")
    df.count()
    val bhj = collectWithSubqueries(df.queryExecution.executedPlan) {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty, "part side must broadcast")
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("ReadSchema") && !s.contains("l_shipdate"),
      "lineitem scan must prune to the joined/aggregated columns")
  }

  test("q142: semi and anti probes reuse the orderkey exchange (bounded shuffle count)") {
    val ex = shuffles(plan("q142_tpch_q21"))
    // lineitem ×3 on l_orderkey (left reused across semi+anti) + the
    // suppkey agg; distinct rides the orderkey partitioning. Anything
    // beyond 5 means a probe re-shuffled the already-partitioned left.
    assert(ex.length <= 5, s"unexpected exchanges: ${ex.map(_.outputPartitioning)}")
  }

  test("q143: the global-average side broadcasts; no-urgent-orders is an anti join") {
    val df = plan("q143_tpch_q22")
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("LeftAnti"), "NOT EXISTS must plan as an anti join")
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"),
      "1-row average side must broadcast")
  }

  test("q146/q147: chunking and random projection are map-only (zero data exchanges)") {
    // ORDER BY adds one range exchange; nothing else may shuffle — both
    // operators' 100 TB claim is "output partitioning follows the input's".
    for (q <- Seq("q146_chunk_documents", "q147_random_projection")) {
      val ex = shuffles(plan(q))
      val nonSort = ex.filterNot(
        _.outputPartitioning.toString.contains("rangepartitioning"))
      assert(nonSort.isEmpty,
        s"$q: unexpected data exchange ${nonSort.map(_.outputPartitioning)}")
    }
  }

  test("q148: KS CDFs never funnel the fact table through one partition") {
    val ex = shuffles(plan("q148_ks_statistic"))
    // same contract as q25: single-partition exchanges are legitimate
    // only as scalar-aggregate merges over per-partition partials.
    val badSingles = ex.filter(s => s.outputPartitioning.numPartitions == 1 &&
      !s.child.toString.contains("HashAggregate"))
    assert(badSingles.isEmpty,
      s"non-aggregate single-partition exchange: $badSingles")
  }

  test("q150: dup-span coverage joins on the gram hash, never all pairs") {
    val df = plan("q150_dup_spans")
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct"))
    assert(s.contains("LeftSemi"), "dup grams must probe via a semi join")
  }

  test("q154: HLL never funnels rows through one partition; sketch stays grouped") {
    val ex = shuffles(plan("q154_hll_distinct"))
    val badSingles = ex.filter(s => s.outputPartitioning.numPartitions == 1 &&
      !s.child.toString.contains("HashAggregate"))
    assert(badSingles.isEmpty,
      s"non-aggregate single-partition exchange: $badSingles")
  }

  test("q160: the PQ codebook broadcasts; vectors never shuffle to meet it") {
    val df = plan("q160_product_quantize")
    val ex = shuffles(df) // runs the query once and finalizes AQE
    val bhj = collectWithSubqueries(df.queryExecution.executedPlan) {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty, "codeword table must broadcast")
    // the only exchanges are the argmin/pivot re-groupings on vec ids
    // (min-over-struct compiles to a partial SortAggregate) — the
    // codebook join itself must not add one
    assert(ex.forall(_.child.toString.contains("Aggregate")),
      "a non-aggregate shuffle means the codebook join stopped broadcasting")
  }

  test("q161: walk steps join on the node key (no cartesian, bounded exchanges)") {
    val df = plan("q161_random_walk")
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"),
      "walk steps must stay equi-joins on the node")
  }

  test("q174: the quartile-stats side broadcasts back onto the facts") {
    val df = plan("q174_tukey_outliers")
    df.count()
    val bhj = collectWithSubqueries(df.queryExecution.executedPlan) {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty, "per-group fence stats must broadcast, not shuffle")
  }

  test("q171: the pairwise stage is an equi-join on the group key") {
    val df = plan("q171_theil_sen")
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"),
      "Theil-Sen pairs must come from the group-key equi-join")
  }

  test("q173: the only window is per-entity; totals broadcast") {
    val df = plan("q173_markov_transitions")
    df.count()
    val exec = df.queryExecution.executedPlan
    val wins = collectWithSubqueries(exec) { case w: WindowExec => w }
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "no unpartitioned window over the event stream")
    val bhj = collectWithSubqueries(exec) {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty, "src-row totals must broadcast")
  }

  test("q175/q176: every window is partitioned (CUSUM by group, skyline by range pid)") {
    for (name <- Seq("q175_cusum", "q176_pareto_frontier")) {
      val df = plan(name)
      df.count()
      val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec => w
      }
      assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
        s"$name must not run an unpartitioned window")
    }
  }

  test("q178: one hash exchange for the gap window + agg, plus the final sort") {
    // The lag window partitions by user and the per-user agg reuses that
    // partitioning — a second hash exchange would mean the agg re-shuffles
    // what the window already co-located.
    val ex = shuffles(plan("q178_interarrival"))
    assert(ex.length <= 2, s"unexpected exchanges: ${ex.map(_.outputPartitioning)}")
    assert(ex.exists(_.outputPartitioning.toString.contains("hashpartitioning")))
  }

  test("q180: fuzzy join pairs only through the block-key equi-join") {
    val df = plan("q180_jaro_winkler")
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"),
      "JW candidates must come from the blocking equi-join, never all-pairs")
    assert(s.contains("graft_jw"), "scorer must be the native expression")
  }

  test("q182: global ranking is take-ordered; only the ≤10-row window is unpartitioned") {
    val df = plan("q182_rbo")
    df.count()
    val exec = df.queryExecution.executedPlan
    assert(exec.toString.contains("TakeOrderedAndProject"),
      "global top-10 must be TakeOrderedAndProject, not a full sort")
    val wins = collectWithSubqueries(exec) { case w: WindowExec => w }
    // natTop's window partitions by nation; the single unpartitioned one
    // ranks only the 10 rows surviving the limit.
    assert(wins.count(_.partitionSpec.isEmpty) <= 1,
      s"unexpected unpartitioned windows: ${wins.map(_.partitionSpec)}")
  }

  test("q183/q184: survival and Wasserstein keep every window partitioned") {
    // Both ride rangeCumSum — the whole point is that neither the
    // duration histogram nor the value support ever funnels through a
    // single-partition window.
    for (name <- Seq("q183_kaplan_meier", "q184_wasserstein")) {
      val df = plan(name)
      df.count()
      val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec => w
      }
      assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
        s"$name must not run an unpartitioned window")
    }
  }

  test("q195: every bottom-k sketch selection is a TakeOrdered heap, never a global sort") {
    val df = plan("q195_kmv_jaccard")
    df.count()
    val exec = df.queryExecution.executedPlan
    assert(exec.toString.contains("TakeOrderedAndProject"),
      "bottom-k must plan as TakeOrderedAndProject")
    val sorts = collectWithSubqueries(exec) { case s: SortExec => s }
    assert(sorts.forall(!_.global),
      s"no global SortExec allowed: ${sorts.map(_.global)}")
  }

  test("q197/q199/q200: the stat-test family runs windowless (pure moment aggregations)") {
    for (name <- Seq("q197_anova_f", "q199_brown_forsythe",
        "q200_jarque_bera", "q203_diversity", "q204_grubbs")) {
      val df = plan(name)
      df.count()
      val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec => w
      }
      assert(wins.isEmpty,
        s"$name must aggregate moments, not rank rows: found ${wins.size} windows")
    }
  }

  test("q198/q201/q202: rank and risk-set windows all partitioned") {
    // q198/q201 ride rangeCumSum (histogram/duration-bounded);
    // q202's windows are per-group over the calendar-bounded series.
    for (name <- Seq("q198_kruskal_wallis", "q201_logrank",
        "q202_pettitt")) {
      val df = plan(name)
      df.count()
      val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec => w
      }
      assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
        s"$name must never funnel rows through one partition")
    }
  }

  test("q205: TPC-H Q2's dimension chain broadcasts; one fact pair agg") {
    val df = plan("q205_tpch_q2")
    df.count()
    val bhj = collectWithSubqueries(df.queryExecution.executedPlan) {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj.length >= 3,
      s"part/supplier dims must broadcast into the fact scan, got ${bhj.length}")
  }

  test("q211/q214/q216/q217: histogram-rank machinery keeps every window partitioned") {
    for (name <- Seq("q211_avg_precision", "q214_wilcoxon",
        "q216_key_skew", "q217_effect_sizes")) {
      val df = plan(name)
      df.count()
      val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec => w
      }
      assert(wins.forall(_.partitionSpec.nonEmpty),
        s"$name must never funnel rows through one partition")
      val badSingles = shuffles(df).filter(s =>
        s.outputPartitioning.numPartitions == 1 &&
          !s.child.toString.contains("HashAggregate"))
      assert(badSingles.isEmpty,
        s"$name: non-aggregate single-partition exchange: $badSingles")
    }
  }

  test("q213: local clustering pairs only through wedge/closure equi-joins") {
    val df = plan("q213_local_clustering")
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"),
      "wedge + closure must be key equi-joins, never all-pairs")
    val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
      case w: WindowExec => w
    }
    assert(wins.isEmpty, "per-node coefficients are aggregates, not ranks")
  }

  test("q331: ILS pairs stay within-list; reductions merge as aggregates") {
    val df = plan("q331_rec_list_ann")
    df.count()
    val badSingles = shuffles(df).filter(s =>
      s.outputPartitioning.numPartitions == 1 &&
        !s.child.toString.contains("HashAggregate"))
    assert(badSingles.isEmpty,
      s"non-aggregate single-partition exchange: $badSingles")
  }

  test("q246: survivorship merges by aggregate only — no per-cluster member sort") {
    val df = plan("q246_survivorship")
    df.count()
    val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
      case w: WindowExec => w
    }
    assert(wins.isEmpty,
      "canonical + mode picks must be max/min-struct aggregates, not windows")
  }

  test("q249: Kendall pair counts join the histogram on the group key") {
    val df = plan("q249_kendall_tau")
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"),
      "cell pairs must come from a per-group equi-join of the histogram")
  }

  test("q250: interval coverage windows are keyed (never empty partitionBy)") {
    val df = plan("q250_interval_coverage")
    df.count()
    val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
      case w: WindowExec => w
    }
    assert(wins.nonEmpty)
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "sweep windows must partition by the key")
  }

  test("q251: Adamic-Adar wedges are center-key equi-joins, no all-pairs") {
    val df = plan("q251_adamic_adar")
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct"),
      "wedge enumeration must equi-join on the center node")
  }

  test("q253: Fisher log-factorial table joins broadcast") {
    val df = plan("q253_fisher_exact")
    df.count()
    val bhj = collectWithSubqueries(df.queryExecution.executedPlan) {
      case b: BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty, "lf probes must be broadcast hash joins")
  }

  test("q254: EWMA history join is a per-group equi-join on the series") {
    val df = plan("q254_ewma_anomaly")
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct"),
      "rolling frame must join history rows by group key")
  }

  test("q262/q263: matched-binary and trend tests run windowless " +
    "(grid + moment aggregations only)") {
    for (q <- Seq("q262_cochran_q", "q263_cochran_armitage")) {
      val df = plan(q)
      df.count()
      val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec => w
      }
      assert(wins.isEmpty, s"$q must not window raw rows")
    }
  }

  test("q264/q269: runs-test and quantile-map windows are keyed or " +
    "ride rangeCumSum's pid partitions") {
    for (q <- Seq("q264_runs_test", "q269_quantile_normalize")) {
      val df = plan(q)
      df.count()
      val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec => w
      }
      assert(wins.nonEmpty)
      assert(wins.forall(_.partitionSpec.nonEmpty),
        s"$q windows must be partitioned")
    }
  }

  test("q265: energy-distance cumulations are partitioned (rangeCumSum)") {
    val df = plan("q265_energy_distance")
    df.count()
    val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
      case w: WindowExec => w
    }
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "histogram cumsum must never run in a single partition")
  }

  test("q270/q262-style moment tests run windowless; q271/q274/q275/" +
    "q277 windows all keyed") {
    for (q <- Seq("q270_mase")) {
      val df = plan(q)
      df.count()
      val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec => w
      }
      assert(wins.isEmpty, s"$q must not window (calendar joins + aggs)")
    }
    for (q <- Seq("q271_cvm_drift", "q274_jonckheere", "q275_page_trend",
        "q277_stl_anomaly", "q278_bootstrap_ci")) {
      val df = plan(q)
      df.count()
      val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec => w
      }
      assert(wins.forall(_.partitionSpec.nonEmpty),
        s"$q must keep every window partitioned")
    }
  }

  test("q279-q298 family: every window keyed or pid-partitioned; " +
    "forecast tables broadcast") {
    for (q <- Seq("q279_pinball", "q280_mood_median", "q281_t_closeness",
        "q282_pr_curve", "q283_lorenz", "q286_dunn",
        "q289_hosmer_lemeshow", "q290_nelson_aalen", "q291_rmst",
        "q292_anderson_darling", "q293_fleiss_kappa", "q294_msprt",
        "q296_ses_backtest", "q298_rfm", "q299_km_ci", "q307_kuiper",
        "q313_bowker", "q319_weighted_median", "q320_kendall_w",
        "q321_gini_split", "q322_youden", "q325_entropy_rate")) {
      val df = plan(q)
      df.count()
      val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec => w
      }
      assert(wins.forall(_.partitionSpec.nonEmpty),
        s"$q must keep every window partitioned")
    }
    // moment-only tests must stay windowless: the Granger lag is an
    // equi-join, the Chow segments are plain aggregates
    for (q <- Seq("q300_granger", "q303_cmh", "q306_chow",
        "q316_dispersion", "q317_temperature", "q323_hhi",
        "q326_hill", "q327_mahalanobis", "q336_gopher_rules")) {
      val df = plan(q)
      df.count()
      val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec => w
      }
      assert(wins.isEmpty, s"$q must not plan any window")
    }
    // the per-slot quantile table and the SES level table are
    // |groups|-bounded and must reach the holdout as broadcasts
    for (q <- Seq("q279_pinball", "q296_ses_backtest")) {
      val df = plan(q)
      df.count()
      val bhj = collectWithSubqueries(df.queryExecution.executedPlan) {
        case b: BroadcastHashJoinExec => b
      }
      assert(bhj.nonEmpty, s"$q forecast join must broadcast")
    }
  }

  test("q333: DSIR log-ratio model joins back as a broadcast; no windows") {
    val df = plan("q333_importance_weights")
    df.count()
    val ex = df.queryExecution.executedPlan
    val bhj = collectWithSubqueries(ex) { case b: BroadcastHashJoinExec => b }
    assert(bhj.nonEmpty,
      "the bounded-bucket log-ratio table must broadcast onto the doc counts")
    val wins = collectWithSubqueries(ex) { case w: WindowExec => w }
    assert(wins.isEmpty, "DSIR weights must not plan any window")
    // Single-pass claim (r7 ADVICE): the corpus tokenize+shuffle is cut
    // by a lazy localCheckpoint at the (doc, bucket) counts, so the
    // final plan reads checkpointed RDDs — the documents parquet scan
    // must not appear in the plan at all (it lives INSIDE the
    // checkpointed lineage, which runs once).
    val s = ex.toString
    assert(s.contains("ExistingRDD") || s.contains("Scan ExistingRDD"),
      "DSIR weights must read the checkpointed bigram counts")
    assert(!s.contains("documents"),
      "the corpus scan must be behind the checkpoint, not re-planned per subplan")
  }

  test("q345/q350: the tokenize pass is checkpointed once; windows " +
    "stay per-document; scalars broadcast") {
    // q345: six subplans (five count tables + the scoring join) read
    // the trigram positions — the documents scan must be behind the
    // lazy localCheckpoint, exactly the q333 DSIR contract.
    for (q <- Seq("q345_trigram_backoff", "q350_contamination_spans")) {
      val df = plan(q)
      df.count()
      val s = df.queryExecution.executedPlan.toString
      assert(s.contains("ExistingRDD"),
        s"$q must read the checkpointed n-gram positions")
      assert(!s.contains("documents"),
        s"$q: the corpus scan must be behind the checkpoint")
    }
    val wins = {
      val df = plan("q350_contamination_spans"); df.count()
      collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec => w
      }
    }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      "q350's gaps-and-islands window must partition by document")
    val noWin = {
      val df = plan("q345_trigram_backoff"); df.count()
      collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec => w
      }
    }
    assert(noWin.isEmpty, "q345 must not plan any window")
  }

  test("q346/q347: centroid tables broadcast; the SemDeDup pair stage " +
    "is a bucket equi-join (no cartesian)") {
    for (q <- Seq("q346_semdedup", "q347_davies_bouldin")) {
      val df = plan(q)
      df.count()
      val ex = df.queryExecution.executedPlan
      val bhj = collectWithSubqueries(ex) { case b: BroadcastHashJoinExec => b }
      assert(bhj.nonEmpty, s"$q centroid join must broadcast")
      assert(!ex.toString.contains("CartesianProduct"),
        s"$q must never plan a cartesian product")
    }
  }

  test("q351: the CCNet tercile window partitions by language") {
    val df = plan("q351_ccnet_buckets")
    df.count()
    val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
      case w: WindowExec => w
    }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      "ntile must run per language, never a global sort")
  }

  test("q352-q358 family: checkpointed single scans, partitioned " +
    "windows, broadcast scalar/centroid tables") {
    // q354/q357/q358 read a checkpointed corpus pass — the documents
    // scan must be behind the checkpoint (the q333 DSIR contract)
    for (q <- Seq("q354_moore_lewis", "q357_yield_funnel")) {
      val df = plan(q)
      df.count()
      val s = df.queryExecution.executedPlan.toString
      assert(s.contains("ExistingRDD"),
        s"$q must read the checkpointed corpus pass")
      assert(!s.contains("documents"),
        s"$q: the corpus scan must be behind the checkpoint")
    }
    // moment-only shapes must not plan any window
    for (q <- Seq("q353_freq_spectrum", "q354_moore_lewis",
        "q355_silhouette", "q356_knn_outlier", "q357_yield_funnel",
        "q358_pair_qa")) {
      val df = plan(q)
      df.count()
      val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec => w
      }
      assert(wins.isEmpty, s"$q must not plan any window")
    }
    // q352's global order rides globalRank: every window partitioned
    // (the per-score tie-break), never a single-partition sort-rank
    val sp = plan("q352_shard_plan")
    sp.count()
    val spw = collectWithSubqueries(sp.queryExecution.executedPlan) {
      case w: WindowExec => w
    }
    assert(spw.nonEmpty && spw.forall(_.partitionSpec.nonEmpty),
      "q352 must rank via partitioned windows only (globalRank)")
    // centroid/scalar tables broadcast onto the corpus side
    for (q <- Seq("q355_silhouette", "q352_shard_plan")) {
      val df = plan(q)
      df.count()
      val ex = df.queryExecution.executedPlan.toString
      assert(ex.contains("Broadcast"), s"$q small side must broadcast")
    }
  }

  test("q359-q364 family: keyed windows only, checkpointed single " +
    "scans, bounded top-k never a global sort") {
    // q359's dup-survivor window (keyed on the unit hash) and q360's
    // chunk-index window (keyed on the document) both sit BEHIND the
    // lazy localCheckpoint that cuts the shared lineage, so the final
    // plan must read the checkpoint (ExistingRDD) and carry no window
    // of its own — and never re-scan the corpus.
    for (q <- Seq("q359_dup_flow", "q360_cdc_chunks")) {
      val df = plan(q)
      df.count()
      val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec => w
      }
      assert(wins.isEmpty,
        s"$q: the keyed window must be behind the checkpoint")
      val s = df.queryExecution.executedPlan.toString
      assert(s.contains("ExistingRDD"),
        s"$q must read its checkpointed dup/chunk pass")
      assert(!s.contains("documents"),
        s"$q: the corpus scan must be behind the checkpoint")
    }
    // moment-only shapes: no window anywhere (q361 rides globalRank's
    // partitioned tie-break windows, checked as partitioned)
    for (q <- Seq("q362_bpe_merges", "q363_mixture_correction",
        "q364_kl_novelty")) {
      val df = plan(q)
      df.count()
      val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec => w
      }
      assert(wins.isEmpty, s"$q must not plan any window")
    }
    val rb = plan("q361_rank_blend")
    rb.count()
    val rbw = collectWithSubqueries(rb.queryExecution.executedPlan) {
      case w: WindowExec => w
    }
    assert(rbw.nonEmpty && rbw.forall(_.partitionSpec.nonEmpty),
      "q361's three ranks must ride partitioned windows (globalRank)")
    // q361/q364 read a checkpointed signal/token pass
    for (q <- Seq("q361_rank_blend", "q364_kl_novelty")) {
      val df = plan(q)
      df.count()
      val s = df.queryExecution.executedPlan.toString
      assert(s.contains("ExistingRDD"),
        s"$q must read its checkpointed pass")
      assert(!s.contains("documents"),
        s"$q: the corpus scan must be behind the checkpoint")
    }
    // q362's top-20 must be a bounded TakeOrdered, not a global sort
    val bp = plan("q362_bpe_merges")
    bp.count()
    assert(bp.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"),
      "q362 top-k must plan TakeOrderedAndProject")
  }

  test("q365-q370 family: checkpointed hash passes, keyed windows " +
    "only, moment shapes windowless") {
    // q365/q369: the boundary-hash / normalized pass is checkpointed
    // once for its fan-out consumers; no window anywhere. q365's only
    // base-table scan is the column-pruned id spine; q369's corpus
    // scan is entirely behind the checkpoint.
    for (q <- Seq("q365_prefix_dup", "q369_isotropy")) {
      val df = plan(q)
      df.count()
      val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec => w
      }
      assert(wins.isEmpty, s"$q must not plan any window")
      val s = df.queryExecution.executedPlan.toString
      assert(s.contains("ExistingRDD"),
        s"$q must read its checkpointed pass")
    }
    assert(!plan("q369_isotropy").queryExecution.executedPlan.toString
      .contains("embeddings"),
      "q369: the embeddings scan must be behind the checkpoint")
    // pure aggregation shapes: no window, no join with the corpus
    for (q <- Seq("q366_heaps_law", "q367_selfrep",
        "q368_truncation_loss")) {
      val df = plan(q)
      df.count()
      val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec => w
      }
      assert(wins.isEmpty, s"$q must not plan any window")
    }
    // q370: the run scan rides shard-keyed windows over the
    // checkpointed hashed pass — never a global order
    val il = plan("q370_interleave")
    il.count()
    val ilw = collectWithSubqueries(il.queryExecution.executedPlan) {
      case w: WindowExec => w
    }
    assert(ilw.nonEmpty && ilw.forall(_.partitionSpec.nonEmpty),
      "q370's run windows must be shard-partitioned")
    val ils = il.queryExecution.executedPlan.toString
    assert(ils.contains("ExistingRDD") && !ils.contains("documents"),
      "q370 must read only the checkpointed hashed pass")
  }

  test("q371-q376 family: windowless everywhere, checkpointed " +
    "fan-out passes, broadcast side tables") {
    // none of the six plans a window (the dedup-policy arg-extremes
    // are struct min/max, the JS absent-tail is closed-form)
    for (q <- Seq("q371_shard_js", "q372_dedup_policy",
        "q373_burstiness", "q374_vocab_overlap",
        "q375_topic_lang_grid", "q376_gopher_ablation")) {
      val df = plan(q)
      df.count()
      val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec => w
      }
      assert(wins.isEmpty, s"$q must not plan any window")
    }
    // the (shard, token) / (source, token) / flag passes are
    // checkpointed once; the corpus never re-scans past them
    for (q <- Seq("q371_shard_js", "q374_vocab_overlap",
        "q376_gopher_ablation")) {
      val df = plan(q)
      df.count()
      val s = df.queryExecution.executedPlan.toString
      assert(s.contains("ExistingRDD"),
        s"$q must read its checkpointed pass")
      assert(!s.contains("documents"),
        s"$q: the corpus scan must be behind the checkpoint")
    }
    // small side tables ride broadcast joins: q371's shard totals,
    // q373's doc count, q376's token total
    for (q <- Seq("q371_shard_js", "q373_burstiness",
        "q376_gopher_ablation")) {
      val df = plan(q)
      df.count()
      assert(collectWithSubqueries(df.queryExecution.executedPlan) {
        case b: BroadcastHashJoinExec => b
        case n: BroadcastNestedLoopJoinExec => n
      }.nonEmpty, s"$q's scalar/side tables must broadcast")
    }
  }

  test("q377-q382 family: windowless except the rank-histogram grid," +
    " checkpointed pair/signal passes") {
    // q378's two deciles ride globalRank's keyed tie-break windows;
    // everything else in the family is windowless (struct-extremes,
    // hash aggs, the closed-form JS tail, the one-pass tau sweep)
    for (q <- Seq("q377_source_js", "q379_dedup_savings",
        "q380_corpus_delta", "q381_semdedup_sweep", "q382_sttr")) {
      val df = plan(q)
      df.count()
      val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec => w
      }
      assert(wins.isEmpty, s"$q must not plan any window")
    }
    // q378's globalRank tie-break windows (keyed — audited on q361's
    // shared machinery) sit BEHIND the checkpointed ≤100-row grid, so
    // the final plan itself is windowless too
    val qg = plan("q378_quality_length_grid")
    qg.count()
    val qgw = collectWithSubqueries(qg.queryExecution.executedPlan) {
      case w: WindowExec => w
    }
    assert(qgw.isEmpty,
      "q378's rank windows must be behind the grid checkpoint")
    // checkpointed fan-out passes: q377's (source, token) counts,
    // q379's hashed pass, q381's pair table, q378's signal table
    for (q <- Seq("q377_source_js", "q378_quality_length_grid",
        "q379_dedup_savings", "q381_semdedup_sweep")) {
      val df = plan(q)
      df.count()
      val s = df.queryExecution.executedPlan.toString
      assert(s.contains("ExistingRDD"),
        s"$q must read its checkpointed pass")
    }
    assert(!plan("q381_semdedup_sweep").queryExecution.executedPlan
      .toString.contains("embeddings"),
      "q381: the embeddings scan must be behind the checkpoint")
  }

  test("q383-q388 family: keyed windows only, checkpointed fan-out " +
    "passes, one-agg sampler audit") {
    // q383's first-occurrence window is (doc, token)-keyed — never a
    // global order
    locally {
      val df = plan("q383_position_novelty")
      df.count()
      val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec => w
      }
      assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
        "q383's first-occurrence window must be keyed")
    }
    // q386's md5-keyed dup window and globalRank tie window sit
    // BEHIND the ≤10-row grid checkpoint (the q378 convention), so
    // its final plan is windowless and reads the checkpointed grid
    locally {
      val df = plan("q386_dup_length_profile")
      df.count()
      val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec => w
      }
      assert(wins.isEmpty,
        "q386's rank/dup windows must be behind the grid checkpoint")
      assert(df.queryExecution.executedPlan.toString
        .contains("ExistingRDD"),
        "q386 must read its checkpointed grid")
    }
    // windowless shapes: grid shares, centroid drift, fidelity sweep,
    // sampler audit
    for (q <- Seq("q384_lang_confusion", "q385_embedding_drift",
        "q387_minhash_fidelity", "q388_sample_overlap")) {
      val df = plan(q)
      df.count()
      val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec => w
      }
      assert(wins.isEmpty, s"$q must not plan any window")
    }
    // checkpointed fan-out passes: q385's tagged union + label table,
    // q387's shingle/signature/pair tables
    for (q <- Seq("q385_embedding_drift", "q387_minhash_fidelity")) {
      val df = plan(q)
      df.count()
      assert(df.queryExecution.executedPlan.toString
        .contains("ExistingRDD"),
        s"$q must read its checkpointed pass")
    }
    assert(!plan("q385_embedding_drift").queryExecution.executedPlan
      .toString.contains("embeddings"),
      "q385: the embeddings scans must be behind the union checkpoint")
    // q388 is ONE hash agg over a row-local projection: no join
    // operator of any kind in the executed plan
    val so = plan("q388_sample_overlap")
    so.count()
    assert(collectWithSubqueries(so.queryExecution.executedPlan) {
      case j: BroadcastHashJoinExec => j
      case j: BroadcastNestedLoopJoinExec => j
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }.isEmpty, "q388 must not plan any join")
    // q384's row totals ride a broadcast join back onto the grid
    val lc = plan("q384_lang_confusion")
    lc.count()
    assert(collectWithSubqueries(lc.queryExecution.executedPlan) {
      case b: BroadcastHashJoinExec => b
    }.nonEmpty, "q384's row totals must broadcast")
  }

  test("q389-q394 family: windowless audits, keyed rank window only " +
    "in the OOV vocab, broadcast vocab join, joinless metadata scan") {
    // windowless shapes: cohesion (centroid identity), cluster purity
    // (CC + hash aggs), quality delta (row-local gopher via keep),
    // hubness (TopKAggregator, not a rank window)
    for (q <- Seq("q389_source_cohesion", "q390_neardup_cluster_purity",
        "q391_quality_delta", "q392_hubness",
        "q393_metadata_consistency")) {
      val df = plan(q)
      df.count()
      val wins = collectWithSubqueries(df.queryExecution.executedPlan) {
        case w: WindowExec => w
      }
      assert(wins.isEmpty, s"$q must not plan any window")
    }
    // q394's only window is globalRank's score-keyed tie-break over
    // the vocab histogram; the bounded top-V list must broadcast onto
    // the eval token stream
    val oov = plan("q394_oov_transfer")
    oov.count()
    val oovWins = collectWithSubqueries(oov.queryExecution.executedPlan) {
      case w: WindowExec => w
    }
    assert(oovWins.forall(_.partitionSpec.nonEmpty),
      "q394's rank window must be keyed")
    assert(collectWithSubqueries(oov.queryExecution.executedPlan) {
      case b: BroadcastHashJoinExec => b
    }.nonEmpty, "q394's top-V vocab must broadcast")
    // q393 is ONE hash agg over a row-local projection: no join
    val mc = plan("q393_metadata_consistency")
    mc.count()
    assert(collectWithSubqueries(mc.queryExecution.executedPlan) {
      case j: BroadcastHashJoinExec => j
      case j: BroadcastNestedLoopJoinExec => j
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }.isEmpty, "q393 must not plan any join")
  }

  test("q397: exactly ONE unconditioned join (the sampled exact " +
    "baseline, ideally broadcast); the ANN side joins on the cell id") {
    val df = plan("q397_ann_recall")
    df.count()
    val s = df.queryExecution.executedPlan.toString
    // the 1-in-20 query sample is small, so Spark broadcasts it under
    // the brute-force pair sweep (BNLJ) — CartesianProduct only if the
    // sample side ever outgrows the broadcast threshold. The second
    // unconditioned join is the 1-row n_queries scalar merge (the
    // repo-wide crossJoin(broadcast(agg)) pattern).
    val n = "CartesianProduct".r.findAllIn(s).length +
      "BroadcastNestedLoopJoin".r.findAllIn(s).length
    assert(n == 2, s"expected the sampled exact pair sweep + the " +
      s"1-row scalar merge and nothing else, got $n")
  }

  test("q396/q398/q399/q400: fidelity/cross-lang/transitivity/" +
    "compressibility plan no cartesian and no global window") {
    for (q <- Seq("q396_srp_fidelity", "q398_crosslang_neardup",
        "q399_dedup_transitivity", "q400_char_compressibility")) {
      val df = plan(q)
      df.count()
      val s = df.queryExecution.executedPlan.toString
      assert(!s.contains("CartesianProduct"), s"$q plans a cartesian")
    }
    // q395's running sums must stay shard-keyed (never a global cumsum)
    val wins = collectWithSubqueries(
      plan("q395_pack_contamination").queryExecution.executedPlan) {
      case w: WindowExec => w
    }
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "q395 must not plan an unpartitioned window")
  }

  test("no query's executed plan contains a cartesian product except the exact-kNN baselines") {
    // q109's reworked draw: the per-user pick is the BOUNDED
    // TopKAggregator hash agg (n entries of state per user, map-side
    // partial merge), never a row_number window sorting the whole
    // anti-joined users×catalog grid per user. The only window-free
    // sort allowed is the final ORDER BY (rangepartitioning).
    val neg = plan("q109_negative_sample")
    // collect() (not count()) so THIS queryExecution runs and its
    // exchange metrics populate — count() executes a derived plan.
    neg.collect()
    val negExec = neg.queryExecution.executedPlan
    assert(collectWithSubqueries(negExec) { case w: WindowExec => w }.isEmpty,
      "q109 must not rank the users×catalog grid through a window")
    val drawSorts = collectWithSubqueries(negExec) { case s: SortExec => s }
      .filter(_.sortOrder.toString.contains("__u"))
    assert(drawSorts.isEmpty,
      s"q109 must not sort by the md5 draw (bounded hash agg only): $drawSorts")
    assert(negExec.toString.toLowerCase.contains("topkaggregator"),
      "q109's per-user pick must be the bounded TopKAggregator")
    // VOLUME contract: the map-side partial topK bounds what the
    // user-key exchange carries to ≤ k candidates per user per map
    // task — the naive window form would shuffle the whole anti-joined
    // users×catalog grid. Measured off the executed plan's shuffle
    // write metrics (slack ×4 for map-task multiplicity at 4-way
    // local parallelism).
    val users = spark.read.parquet(s"$dir/orders.parquet")
      .filter("o_custkey < 200").select("o_custkey").distinct().count()
    val catalog = spark.read.parquet(s"$dir/part.parquet")
      .filter("p_partkey < 500").count()
    val topkExchanges = collectWithSubqueries(negExec) {
      case s: ShuffleExchangeLike
        if s.child.toString.contains("partial_topkaggregator") => s
    }
    assert(topkExchanges.nonEmpty, "expected the partial-topK exchange")
    val written = topkExchanges.map(
      _.metrics("shuffleRecordsWritten").value).sum
    assert(written > 0 && written <= users * 5 * 4 * 4,
      s"partial-topK exchange carried $written rows for $users users")
    assert(written < users * catalog / 2,
      s"exchange volume $written must be far below the " +
        s"${users * catalog}-row grid")

    // q451's rejection draw must never sweep the catalog: no
    // BroadcastNestedLoopJoin (the q109 grid form's broadcast cross
    // join) and no cartesian anywhere in the executed plan — every
    // join is an equi-join, so generated rows are |U|·slots plus the
    // id-join hits, INDEPENDENT of |C| — and the per-user pick stays
    // the bounded TopKAggregator, never a window.
    val rej = plan("q451_negsample_rejection")
    rej.collect()
    val rejExec = rej.queryExecution.executedPlan
    assert(!rejExec.toString.contains("BroadcastNestedLoopJoin") &&
      !rejExec.toString.contains("CartesianProduct"),
      "q451 must not plan any non-equi join over the catalog")
    assert(collectWithSubqueries(rejExec) { case w: WindowExec => w }.isEmpty,
      "q451 must not rank its draw through a window")
    assert(rejExec.toString.toLowerCase.contains("topkaggregator"),
      "q451's per-user pick must be the bounded TopKAggregator")

    // Only THE declared exact-baseline form (q26) may cross-join; the
    // other exact forms were demoted to unit fixtures in round 9
    // (q34/q191/q194/q218 — their bucketed scale twins q60/q329-q331
    // are declared and swept like everything else, as q266 has been
    // since round 7). q397's exact side is a DELIBERATE
    // 1-in-20-sampled brute-force baseline (the recall audit needs
    // ground truth); its ANN side stays an equi-join and is covered by
    // its own plan test. q438/q439 are the same audit machinery at the
    // adaptive width (leading-dim and SRP buckets) — same sampled
    // exact side, same whitelist class; q444 is that class again for
    // the TRAINED quantizer (IVF nprobe recall vs the same 1-in-20
    // sampled exact baseline), and q449 for the SHARDED trained
    // quantizer (same exact side; its ANN side is shard equi-joins).
    // q452 is the dial sweep over that same machinery — ONE shared
    // 1-in-20 sampled exact side; every dial side is equi-joins.
    val allowed = Set("q26_cosine_topk", "q397_ann_recall",
      "q438_ann_adaptive_recall", "q439_ann_srp_recall",
      "q444_ivf_recall", "q449_ivf_sharded_recall",
      "q450_recall_per_candidate", "q452_ivf_dial_sweep")
    for ((name, fn) <- SparkEntry.queries if !allowed(name)) {
      val df = fn(spark, dir)
      val s = df.queryExecution.executedPlan.toString
      assert(!s.contains("CartesianProduct"),
        s"$name plans a cartesian product")
    }
  }
}
