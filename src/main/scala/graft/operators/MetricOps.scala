package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Metric + skew-handling operators.
  *
  * A9 distributed ROC-AUC: the rank-formula AUC
  * (Σ rank⁺ − P(P+1)/2) / (P·N) needs a GLOBAL rank, but a global
  * `row_number()` window is a single-partition bottleneck. Here the
  * rank decomposes into
  *   rank(x) = (# rows with smaller score)  [broadcast join on the
  *             tiny per-score histogram]
  *           + (row_number within this score's partition, tie-broken
  *             by id)  [a window partitioned BY SCORE — fully parallel]
  * which is exactly the tie-broken global rank, with no single-reducer
  * stage. The per-score histogram is |distinct scores| rows — the only
  * "global" object, and it broadcasts.
  */
object MetricOps {

  /** Global tie-broken rank per row, distributed (see object doc).
    * Output adds `r` = 1-based rank by (score, tiebreak).
    *
    * The score is QUANTIZED to 6 dp before the histogram: without it, a
    * continuous score (raw model probabilities) makes the "tiny
    * per-score histogram" n rows — a single-partition window over the
    * whole dataset, the exact bottleneck this decomposition exists to
    * avoid. 6 dp bounds the histogram at ~10⁶ rows (broadcastable
    * forever) and is affine-consistent with the 6 dp the AUC itself
    * rounds to; integer and already-quantized scores pass through
    * bit-unchanged. Rows that tie only after quantization are ordered
    * by `tieCol` — the same deterministic tie-broken-rank semantics.
    */
  def globalRank(df: DataFrame, scoreCol: String, tieCol: String): DataFrame = {
    // Null scores: rank LAST (ANSI ORDER BY default, matching the
    // DuckDB oracle), and join null-safely — a bare equi-join would
    // silently drop null-score rows from the metric.
    val q = df.withColumn("__qs", round(col(scoreCol).cast("double"), 6))
    val hist = q.groupBy(col("__qs")).agg(count(lit(1)).as("__n"))
    // Cumulative "count below" over the histogram WITHOUT a global
    // single-partition window: range-partition by score (order-
    // preserving), cumulate within each range partition, and add the
    // totals of all earlier partitions via a broadcast triangular
    // self-join on the partition id — |cluster partitions|² pairs,
    // bounded by config, never by data. The result is independent of
    // where the range boundaries land.
    // localCheckpoint PINS the partition ids: __pid feeds both the
    // per-partition cumsum and the partition-total join below, and
    // without materialization those are two separate exchanges whose
    // sampled range boundaries (and thus pids) are only identical while
    // exchange reuse happens to dedup them — a silent-wrong-ranks
    // hazard, not a perf choice. The histogram is ≤ ~1e6 rows.
    val parts = hist.repartitionByRange(col("__qs").asc_nulls_last)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val withCum = parts.withColumn("__cum",
      sum(col("__n")).over(
        Window.partitionBy(col("__pid")).orderBy(col("__qs").asc_nulls_last)))
    val ptot = parts.groupBy(col("__pid")).agg(sum(col("__n")).as("__pn"))
    val pbelow = ptot.as("pa")
      .join(broadcast(ptot.as("pb")), col("pb.__pid") < col("pa.__pid"), "left")
      .groupBy(col("pa.__pid").as("__pid"))
      .agg(coalesce(sum(col("pb.__pn")), lit(0L)).as("__pbelow"))
    val below = withCum.join(broadcast(pbelow), "__pid")
      .select(col("__qs").as("__score"),
        (col("__pbelow") + col("__cum") - col("__n")).as("__below"))
    val within = Window.partitionBy(col("__qs")).orderBy(col(tieCol))
    q.join(broadcast(below), col("__qs") <=> col("__score"))
      .withColumn("r", col("__below") + row_number().over(within))
      .drop("__below", "__score", "__qs")
  }

  /** A9: rank-formula ROC-AUC with deterministic tiebreak — one
    * aggregate over the distributed ranks.
    */
  def auc(df: DataFrame, labelCol: String, scoreCol: String,
          tieCol: String, roundTo: Int = 6): DataFrame =
    globalRank(df, scoreCol, tieCol).agg(
      round(
        (sum(when(col(labelCol) === 1, col("r")).otherwise(0L)).cast("double")
          - sum(col(labelCol)).cast("double") * (sum(col(labelCol)) + 1) / 2)
          / (sum(col(labelCol)).cast("double")
            * (count(lit(1)) - sum(col(labelCol)))), roundTo).as("auc"))

  /** Two-phase salted aggregation for skewed keys: phase 1 aggregates
    * on (key, salt) — spreading a hot key over `saltBuckets` reducers —
    * phase 2 merges the partials per key. (Spark's partial aggregation
    * already does this when the map side sees the hot key, but a skewed
    * SHUFFLE key after a join does not benefit — this does.)
    *
    * Exactness: counts and integral/decimal sums decompose exactly, so
    * the result equals a direct groupBy bit-for-bit. Floating-point
    * sums would depend on the (salt-induced) grouping order — pass a
    * DECIMAL-cast value column when reproducibility matters (q42 does).
    */
  def saltedCountSum(df: DataFrame, keyCol: String, valueCol: String,
                     saltBuckets: Int): DataFrame =
    // Salt mixes in the source partition id: a hot key spreads even when
    // its values are all identical (a value-only hash would put them in
    // one salt bucket). Assignment needs to spread, not be stable.
    df.withColumn("__salt",
        pmod(hash(col(valueCol), spark_partition_id()), lit(saltBuckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__c"), sum(col(valueCol)).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum(col("__c")).as("cnt"), sum(col("__s")).as("sum"))

  /** Skew-safe equi-join: the large side gets a per-row salt (from
    * `saltExpr` — any deterministic expression over its columns, e.g. a
    * row-id hash), the SMALL side is replicated once per salt value,
    * and the join key becomes (key, salt) — a hot key's rows spread
    * over `salts` reducers instead of funneling into one. Result is
    * identical to the plain join (every (key, salt) pair carries a full
    * copy of the small side's rows for that key); cost is |small| ×
    * `salts` extra build rows — the standard trade when one key owns a
    * double-digit share of the fact table and AQE's skew split can't
    * apply (e.g. the skew is born in the shuffle, not read from files).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keyCol: String,
                 saltExpr: Column, salts: Int): DataFrame = {
    val l = large.withColumn("__salt", pmod(saltExpr, lit(salts)).cast("int"))
    val s = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    l.join(s, Seq(keyCol, "__salt")).drop("__salt")
  }

  /** A7 at scale: HLL-based distinct counts for the constant-prune
    * check — at 100 TB the exact `countDistinct` shuffle is unnecessary
    * when the question is only "is cardinality 1?" (rsd 5% cannot
    * confuse 1 with 2).
    */
  /** Per-user ranking metrics — NDCG@k, MRR@k, recall@k — for a scored
    * (user, item, score, label∈{0,1}) table. The eval surface behind any
    * retrieval/recall stage (A9's AUC grades the ranker pointwise; these
    * grade the ranked LIST).
    *
    * Distributed shape: one window partitioned by user (rank within
    * user — never a global sort), then hash aggregation on the user key.
    * The 1/log2(rank+1) discount weights live in a k-row table built
    * with `sequence` and broadcast to both the DCG and the ideal-DCG
    * sides, so both engines discount with bit-identical constants; DCG
    * sums are DECIMAL-exact (partial-aggregation order can't flip the
    * hash). Users with no positive labels are excluded (IDCG = 0 is
    * undefined, matching standard eval practice).
    */
  def rankingMetrics(df: DataFrame, userCol: String, itemCol: String,
                     scoreCol: String, labelCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val weights = (1 to k).toDF("__rnk")
      .select(col("__rnk"),
        round(lit(1.0) / log2(col("__rnk") + lit(1.0)), 10)
          .cast("decimal(28,12)").as("__w"))
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(scoreCol).desc, col(itemCol))
    val pos = df.groupBy(col(userCol))
      .agg(sum(col(labelCol)).cast("long").as("__npos"))
      .filter(col("__npos") > 0)
    val top = df.withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") <= k)
    val dcg = top.join(broadcast(weights), Seq("__rnk"))
      .groupBy(col(userCol))
      .agg(sum(when(col(labelCol) === 1, col("__w"))
          .otherwise(lit(0).cast("decimal(28,12)"))).as("__dcg"),
        sum(col(labelCol)).cast("long").as("__hits"),
        min(when(col(labelCol) === 1, col("__rnk"))).as("__first"))
    val idcg = pos.crossJoin(broadcast(weights))
      .filter(col("__rnk") <= least(col("__npos"), lit(k)))
      .groupBy(col(userCol), col("__npos"))
      .agg(sum(col("__w")).as("__idcg"))
    dcg.join(idcg, Seq(userCol))
      .select(col(userCol),
        round(col("__dcg").cast("double") / col("__idcg").cast("double"), 6)
          .as("ndcg"),
        coalesce(round(lit(1.0) / col("__first"), 6), lit(0.0)).as("mrr"),
        round(col("__hits").cast("double") / col("__npos"), 6).as("recall"))
  }

  /** Calibration curve (reliability diagram): bucket predictions into
    * `nBins` equal-width score bins; per bin report count, mean
    * predicted score, and observed positive rate. One hash aggregation;
    * per-bin score sums are DECIMAL-exact so partial-agg order cannot
    * perturb the mean. Scores are expected in [0, 1] (the top bin
    * absorbs score = 1.0).
    */
  def calibration(df: DataFrame, scoreCol: String, labelCol: String,
                  nBins: Int = 10): DataFrame =
    df.withColumn("__bin",
        least(floor(col(scoreCol) * nBins), lit(nBins - 1)).cast("int"))
      .groupBy(col("__bin").as("bin"))
      .agg(count(lit(1)).as("n"),
        round(sum(round(col(scoreCol), 6).cast("decimal(18,8)")).cast("double")
          / count(lit(1)), 6).as("mean_score"),
        round(sum(col(labelCol)).cast("double") / count(lit(1)), 6)
          .as("pos_rate"))

  /** Population stability index between an `expected` and an `actual`
    * slice — the standard feature-drift alarm. Equal-width bins (last
    * bin open-ended), Laplace smoothing (n+1)/(N+bins) so empty bins
    * never produce ln(0), per-bin contributions rounded then summed as
    * DECIMAL, total repeated on every row. Everything derives from
    * integer counts → bit-identical across engines. PSI < 0.1 is
    * conventionally stable, > 0.25 action-worthy.
    */
  def psi(df: DataFrame, valueCol: String, sideCol: String,
          expectedValue: String, binWidth: Double, nBins: Int): DataFrame = {
    val binned = df.withColumn("__bin",
      least(floor(col(valueCol) / binWidth), lit(nBins - 1)).cast("int"))
    val counts = binned.groupBy(col("__bin"))
      .agg(sum(when(col(sideCol) === expectedValue, 1).otherwise(0))
          .cast("long").as("n_exp"),
        sum(when(col(sideCol) =!= expectedValue, 1).otherwise(0))
          .cast("long").as("n_act"))
    val tot = counts.agg(sum("n_exp").as("__te"), sum("n_act").as("__ta"))
    val terms = counts.crossJoin(broadcast(tot))
      .withColumn("__p",
        (col("n_exp") + lit(1)).cast("double") / (col("__te") + lit(nBins)))
      .withColumn("__q",
        (col("n_act") + lit(1)).cast("double") / (col("__ta") + lit(nBins)))
      .withColumn("__term",
        round((col("__p") - col("__q")) * log(col("__p") / col("__q")), 10)
          .cast("decimal(28,12)"))
    // total repeated per row via a broadcast 1-row cross join — the same
    // trick as `mutualInfo`, instead of an empty-partition window (which
    // plans a single-partition exchange and WARNs)
    val total = terms.agg(
      round(sum(col("__term")).cast("double"), 6).as("psi_total"))
    terms.crossJoin(broadcast(total))
      .select(col("__bin").as("bin"), col("n_exp"), col("n_act"),
        col("__term").cast("double").as("term"), col("psi_total"))
  }

  /** Mutual information I(X;Y) between two categorical columns, in nats —
    * the model-free feature-relevance score used to rank candidate
    * features against the label before training.
    *
    * I = Σ_{x,y} p(x,y) · ln( p(x,y) / (p(x)·p(y)) ), cells with zero
    * joint count contribute nothing. All probabilities derive from exact
    * BIGINT counts; each cell term is rounded to 12 dp and summed as
    * DECIMAL so the total is independent of cell visit order (the same
    * exact-regroup trick as `psi`). Scale: one hash aggregation over
    * (x, y) — |X|·|Y| cells — then two broadcast marginal joins; no
    * all-pairs anything.
    */
  def mutualInfo(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    // materialize the contingency table once: the marginals and the
    // total each re-derive from it, and without the checkpoint every
    // branch would re-scan the raw input (4 scans for 1)
    val joint = df.groupBy(col(xCol).as("__x"), col(yCol).as("__y"))
      .agg(count(lit(1)).as("__nxy"))
      .localCheckpoint(true)
    val mx = joint.groupBy("__x").agg(sum("__nxy").cast("long").as("__nx"))
    val my = joint.groupBy("__y").agg(sum("__nxy").cast("long").as("__ny"))
    val n = joint.agg(sum("__nxy").cast("long").as("__n"))
    joint
      .join(broadcast(mx), "__x").join(broadcast(my), "__y")
      .crossJoin(broadcast(n))
      .withColumn("__term",
        round((col("__nxy").cast("double") / col("__n")) *
          log(col("__nxy").cast("double") * col("__n") /
            (col("__nx").cast("double") * col("__ny"))), 12)
          .cast("decimal(28,14)"))
      .agg(round(sum(col("__term")).cast("double"), 6).as("mi_nats"),
        count(lit(1)).as("n_cells"),
        max("__n").as("n_rows"))
  }

  /** Spearman rank correlation per group: Pearson correlation of
    * average-tie ranks, computed entirely over the joint (x, y) value
    * histogram. The raw rows are exchanged ONCE (the joint hash agg);
    * both doubled average-tie ranks (2·cum − tie + 1 ≡ 2·below + n + 1
    * — integral at tie midpoints; correlation is affine-invariant)
    * come from windows DIRECTLY over the histogram rows: the cumulative
    * weight (default RANGE frame includes ties) minus the tie weight
    * (unordered (group, value) partition window). No self-joins, no
    * materialization — one linear plan: raw agg → one group exchange →
    * two in-partition sorts → moment agg. (The previous form derived
    * two marginal histograms and joined them back; the joins and the
    * eager checkpoint cost ~1.7× this plan at sf0.1 and re-scanned the
    * raw table three times.)
    *
    * Determinism: the doubled ranks are CENTERED by their exact mean
    * (tot+1 — an integer, so Σw·rc ≡ 0 and the Pearson form collapses
    * to Σw·rc·rc' / √(Σw·rc²)·√(Σw·rc'²)), every moment is an exact
    * integer summed as DECIMAL(38,0) — order-independent — and the
    * final corr is a few double ops on those exact moments, rounded to
    * 6 dp. try_divide returns null on zero rank variance (all-tied
    * input) instead of ANSI's divide-by-zero error.
    *
    * Validity bound: |centered doubled rank| < N, so the Σw·rc·rc'
    * moments are bounded by N³ and DECIMAL(38,0) holds exactly for
    * groups up to ~4.6·10¹² rows; beyond that the sum overflows to
    * null under non-ANSI Spark (DuckDB's HUGEINT has nearly the same
    * ceiling). The uncentered form's real ceiling was ~2·10⁹ — its
    * n·Σw·r·r' − Σw·r·Σw·r' correction multiplied two 38-precision
    * decimals (~4N⁴) BEFORE the double cast; centering removes those
    * products entirely. Per-GROUP rows, not total — far above any
    * per-key group a 100 TB corpus produces.
    */
  def spearman(df: DataFrame, groupCol: String, xCol: String,
               yCol: String): DataFrame = {
    val joint = df.groupBy(col(groupCol), col(xCol), col(yCol))
      .agg(count(lit(1)).as("__w"))
    val wg = Window.partitionBy(col(groupCol))
    val wgx = Window.partitionBy(col(groupCol)).orderBy(col(xCol))
    val wgy = Window.partitionBy(col(groupCol)).orderBy(col(yCol))
    val tx = Window.partitionBy(col(groupCol), col(xCol))
    val ty = Window.partitionBy(col(groupCol), col(yCol))
    // all five windows cluster by subsets of (group, value) — Catalyst
    // satisfies them with ONE hash exchange on the group key plus the
    // two per-axis in-partition sorts. Centered doubled rank =
    // 2·cum − tie + 1 − (tot+1) = 2·cum − tie − tot.
    val j = joint
      .withColumn("__tot", sum("__w").over(wg))
      .withColumn("__rx",
        lit(2) * sum("__w").over(wgx) - sum("__w").over(tx) - col("__tot"))
      .withColumn("__ry",
        lit(2) * sum("__w").over(wgy) - sum("__w").over(ty) - col("__tot"))
    j.groupBy(col(groupCol))
      .agg(sum(col("__w")).cast("decimal(38,0)").as("__n"),
        sum(expr("CAST(__w AS DECIMAL(38,0)) * __rx * __ry")).as("__sxy"),
        sum(expr("CAST(__w AS DECIMAL(38,0)) * __rx * __rx")).as("__sxx"),
        sum(expr("CAST(__w AS DECIMAL(38,0)) * __ry * __ry")).as("__syy"))
      .select(col(groupCol),
        round(expr(
          "try_divide(CAST(__sxy AS DOUBLE), " +
            "sqrt(CAST(__sxx AS DOUBLE)) * " +
            "sqrt(CAST(__syy AS DOUBLE)))"), 6)
          .as("spearman"),
        col("__n").cast("long").as("n"))
  }

  def approxConstPruneReport(df: DataFrame, cols: Seq[String]): DataFrame = {
    val sorted = cols.sorted
    val aggs = sorted.map(c => approx_count_distinct(col(c)).as(s"__nd_$c"))
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${sorted.length}, " +
        sorted.map(c => s"'$c', __nd_$c").mkString(", ") +
        ") AS (col_name, n_distinct_approx)")
      .withColumn("keep", (col("n_distinct_approx") > 1).cast("int"))
  }
}
