package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experimentation / policy-evaluation operators: the A/B analysis a
  * recommendation platform runs on top of the metric layer — variance
  * reduction (CUPED), guardrails (sample-ratio mismatch), sensitivity
  * (minimal detectable effect), distribution-free intervals (split
  * conformal), and counterfactual value (IPS/SNIPS off-policy).
  *
  * Shared discipline: every operator collapses the unit table to
  * per-arm (or per-action) moment rows in ONE hash aggregation —
  * values quantize to 4 dp so Σv/Σv² accumulate as exact decimals —
  * and the statistics are fixed double formulas over those exact sums.
  * Nothing here ever windows or re-shuffles raw rows.
  */
object ExperimentOps {

  private def moments(df: DataFrame, armCol: String, yCol: String,
                      xCol: Option[String]) = {
    val base = df.select(col(armCol).cast("int").as("__arm"),
      round(col(yCol).cast("double"), 4).cast("decimal(18,4)").as("__y"),
      round(col(xCol.getOrElse(yCol)).cast("double"), 4)
        .cast("decimal(18,4)").as("__x"))
    base.groupBy(col("__arm"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__y")).as("__sy"), sum(col("__y") * col("__y")).as("__qy"),
        sum(col("__x")).as("__sx"), sum(col("__x") * col("__x")).as("__qx"),
        sum(col("__x") * col("__y")).as("__sxy"))
  }

  /** CUPED (controlled-experiment using pre-experiment data): adjust
    * the metric with the pre-period covariate, θ = ȳ − k(x̄ − x̄_all),
    * k = cov(x, y)/var(x) pooled over BOTH arms. Because the
    * adjustment is linear, the adjusted per-arm means come off the
    * same moment sums — no second pass over rows. Reports the raw and
    * adjusted effects and the theoretical variance-reduction factor
    * ρ²(x, y).
    */
  def cuped(df: DataFrame, armCol: String, yCol: String, xCol: String,
            roundTo: Int = 6): DataFrame = {
    val m = moments(df, armCol, yCol, Some(xCol)).localCheckpoint(true)
    val g = m.agg(sum(col("__n")).as("n"),
        sum(col("__sy")).as("sy"), sum(col("__qy")).as("qy"),
        sum(col("__sx")).as("sx"), sum(col("__qx")).as("qx"),
        sum(col("__sxy")).as("sxy"))
      .withColumn("__mx", col("sx").cast("double") / col("n"))
      .withColumn("__cov", (col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double") / col("n")) /
        col("n"))
      .withColumn("__vx", (col("qx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double") / col("n")) /
        col("n"))
      .withColumn("__vy", (col("qy").cast("double") -
        col("sy").cast("double") * col("sy").cast("double") / col("n")) /
        col("n"))
      .withColumn("__k", when(col("__vx") > 0,
        col("__cov") / col("__vx")).otherwise(lit(0.0)))
    val arms = m.crossJoin(broadcast(g.select(col("__mx"), col("__k"),
        col("__cov"), col("__vx"), col("__vy"))))
      .withColumn("__my", col("__sy").cast("double") / col("__n"))
      .withColumn("__madj", col("__my") - col("__k") *
        (col("__sx").cast("double") / col("__n") - col("__mx")))
    val a0 = arms.filter(col("__arm") === 0).select(
      col("__n").as("n_0"), col("__my").as("__my0"),
      col("__madj").as("__ma0"), col("__k"), col("__cov"), col("__vx"),
      col("__vy"))
    val a1 = arms.filter(col("__arm") === 1).select(
      col("__n").as("n_1"), col("__my").as("__my1"),
      col("__madj").as("__ma1"))
    a0.crossJoin(broadcast(a1))
      .select(col("n_0"), col("n_1"),
        round(col("__k"), roundTo).as("theta_k"),
        round(col("__my1") - col("__my0"), roundTo).as("effect_raw"),
        round(col("__ma1") - col("__ma0"), roundTo).as("effect_cuped"),
        when(col("__vx") > 0 && col("__vy") > 0, round(
          col("__cov") * col("__cov") / (col("__vx") * col("__vy")),
          roundTo)).as("var_reduction"))
  }

  /** Experiment guardrails: sample-ratio-mismatch χ² against the
    * intended 50/50 split ((n₀−n₁)²/(n₀+n₁), 1 df — SRM is the single
    * most common invalidator of A/B readouts) plus the minimal
    * detectable effect at α = 0.05 two-sided, power 0.80:
    * MDE = (z₀.₉₇₅ + z₀.₈₀)·√(s²·(1/n₀ + 1/n₁)) with the pooled
    * variance, z-sum constant 1.959964 + 0.841621 = 2.801585.
    */
  def srmAndPower(df: DataFrame, armCol: String, yCol: String,
                  roundTo: Int = 6): DataFrame = {
    val zSum = 2.801585
    moments(df, armCol, yCol, None)
      .agg(sum(when(col("__arm") === 0, col("__n")).otherwise(0L)).as("n_0"),
        sum(when(col("__arm") === 1, col("__n")).otherwise(0L)).as("n_1"),
        sum(col("__qy")).as("__q"), sum(col("__sy")).as("__s"),
        sum(col("__n")).as("__nn"))
      .withColumn("__var", when(col("__nn") > 1,
        (col("__q").cast("double") - col("__s").cast("double") *
          col("__s").cast("double") / col("__nn")) / (col("__nn") - 1)))
      .select(col("n_0"), col("n_1"),
        round(((col("n_0") - col("n_1")) * (col("n_0") - col("n_1")))
          .cast("double") / (col("n_0") + col("n_1")), roundTo)
          .as("srm_chi2"),
        when(col("__var") > 0 && col("n_0") > 0 && col("n_1") > 0,
          round(lit(zSum) * sqrt(col("__var") *
            (lit(1.0) / col("n_0") + lit(1.0) / col("n_1"))), roundTo))
          .as("mde"))
  }

  /** Split conformal prediction interval: fit any point predictor on
    * the calibration half (here the caller supplies per-row
    * predictions), take the ⌈(1−α)(n+1)⌉-th smallest absolute residual
    * as the interval half-width q̂, and audit empirical coverage on the
    * held-out half — distribution-free ≥(1−α) coverage by exchange-
    * ability, no normality anywhere.
    *
    * Residuals quantize to 4 dp into a histogram; q̂ is an integer
    * inverse-CDF pick off ONE [[MetricOps.rangeCumSum]]; coverage is
    * one aggregate over the test half.
    */
  def conformal(df: DataFrame, splitCol: String, yCol: String,
                predCol: String, level: Double,
                roundTo: Int = 6): DataFrame = {
    val r = df.select(col(splitCol).cast("int").as("__sp"),
      round(abs(col(yCol).cast("double") - col(predCol).cast("double")),
        4).as("__r"))
    val hist = r.filter(col("__sp") === 0)
      .groupBy(col("__r")).agg(count(lit(1)).as("__f"))
    val cum = MetricOps.rangeCumSum(hist, "__r", Seq("__f"))
    val nCal = hist.agg(sum(col("__f")).as("__nc"))
    val qhat = cum.crossJoin(broadcast(nCal))
      .agg(first(col("__nc")).as("n_calib"),
        min(when(col("__cum___f") >=
          ceil(lit(level) * (col("__nc") + 1)), col("__r")))
          .as("__qh"))
    val test = r.filter(col("__sp") === 1)
    test.crossJoin(broadcast(qhat))
      .agg(first(col("n_calib")).as("n_calib"),
        count(lit(1)).as("n_test"), first(col("__qh")).as("__q"),
        sum(when(col("__r") <= col("__qh"), 1L).otherwise(0L)).as("__cov"))
      .select(col("n_calib"), col("n_test"),
        round(col("__q"), 4).as("qhat"),
        round(col("__cov").cast("double") / col("n_test"), roundTo)
          .as("coverage"))
  }

  /** Expected calibration error over equal-width probability bins:
    * ECE = Σ_b (n_b/N)·|acc_b − conf_b| plus the max-bin MCE — the
    * standard "is the score a probability" audit next to q105's
    * reliability curve. Predictions quantize to 6 dp; per-bin
    * Σpred/Σlabel accumulate as exact decimals; |acc−conf| terms snap
    * to 12 dp and sum as DECIMAL. One hash agg on the bin id.
    */
  def ece(df: DataFrame, predCol: String, labelCol: String, nBins: Int,
          roundTo: Int = 6): DataFrame = {
    val b = df.select(
        round(col(predCol).cast("double"), 6).cast("decimal(18,6)")
          .as("__p"),
        col(labelCol).cast("long").as("__l"))
      .withColumn("__b", least(floor(col("__p") * nBins).cast("long"),
        lit(nBins - 1L)))
    val bins = b.groupBy(col("__b"))
      .agg(count(lit(1)).as("__n"), sum(col("__p")).as("__sp"),
        sum(col("__l")).as("__sl"))
      .withColumn("__conf", col("__sp").cast("double") / col("__n"))
      .withColumn("__acc", col("__sl").cast("double") / col("__n"))
      .withColumn("__gap", abs(col("__acc") - col("__conf")))
    bins.agg(sum(col("__n")).as("__nn"), count(lit(1)).as("n_bins_used"),
        sum(round(col("__gap") * col("__n"), 12).cast("decimal(38,12)"))
          .as("__e"),
        max(round(col("__gap"), roundTo)).as("mce"))
      .select(col("__nn").as("n"), col("n_bins_used"),
        round(col("__e").cast("double") / col("__nn"), roundTo).as("ece"),
        col("mce"))
  }

  /** Relative-lift confidence interval by the delta method:
    * lift = m₁/m₀ − 1 with
    * se² = s₁²/(n₁·m₀²) + m₁²·s₀²/(n₀·m₀⁴), CI = lift ± z₀.₉₇₅·se —
    * the readout experimentation teams actually ship ("+2.3% ± 0.8%"),
    * resampling-free. One per-arm moment agg; zero-mean control or
    * degenerate variances null the interval instead of dividing by
    * zero.
    */
  def liftCi(df: DataFrame, armCol: String, yCol: String,
             roundTo: Int = 6): DataFrame = {
    val z = 1.959964
    val m = moments(df, armCol, yCol, None)
      .withColumn("__m", col("__sy").cast("double") / col("__n"))
      .withColumn("__var", when(col("__n") > 1,
        (col("__qy").cast("double") - col("__sy").cast("double") *
          col("__sy").cast("double") / col("__n")) / (col("__n") - 1)))
    val a0 = m.filter(col("__arm") === 0).select(col("__n").as("n_0"),
      col("__m").as("__m0"), col("__var").as("__v0"))
    val a1 = m.filter(col("__arm") === 1).select(col("__n").as("n_1"),
      col("__m").as("__m1"), col("__var").as("__v1"))
    a0.crossJoin(broadcast(a1))
      .withColumn("__lift", when(col("__m0") =!= 0.0,
        col("__m1") / col("__m0") - 1))
      .withColumn("__se", when(col("__m0") =!= 0.0 &&
          col("__v0").isNotNull && col("__v1").isNotNull,
        sqrt(col("__v1") / (col("n_1") * col("__m0") * col("__m0")) +
          col("__m1") * col("__m1") * col("__v0") /
            (col("n_0") * col("__m0") * col("__m0") *
              col("__m0") * col("__m0")))))
      .select(col("n_0"), col("n_1"),
        round(col("__m0"), roundTo).as("mean_0"),
        round(col("__m1"), roundTo).as("mean_1"),
        round(col("__lift"), roundTo).as("lift"),
        round(col("__lift") - lit(z) * col("__se"), roundTo).as("ci_lo"),
        round(col("__lift") + lit(z) * col("__se"), roundTo).as("ci_hi"))
  }

  /** Off-policy evaluation of a deterministic target policy from
    * logged feedback: IPS V̂ = mean(r·w), SNIPS = Σrw/Σw (the self-
    * normalized form that kills propensity-scale variance), and
    * clipped IPS (w capped — the standard bias/variance dial).
    * Propensities are the EMPIRICAL logging rates P(a) (one broadcast
    * margin table), w = 1[a = π]/P(a).
    */
  def offPolicyValue(df: DataFrame, actionCol: String, rewardCol: String,
                     targetAction: String, clipAt: Double,
                     roundTo: Int = 6): DataFrame = {
    val base = df.select(col(actionCol).as("__a"),
      col(rewardCol).cast("double").as("__r"))
    val prop = base.groupBy(col("__a")).agg(count(lit(1)).as("__na"))
    val tot = prop.agg(sum(col("__na")).as("__n"))
    val w = base.join(broadcast(prop), "__a")
      .crossJoin(broadcast(tot))
      .withColumn("__w", when(col("__a") === targetAction,
        col("__n").cast("double") / col("__na")).otherwise(lit(0.0)))
      .withColumn("__wc", least(col("__w"), lit(clipAt)))
    w.agg(count(lit(1)).as("n"),
        sum(round(col("__r") * col("__w"), 12).cast("decimal(38,12)"))
          .as("__rw"),
        sum(round(col("__w"), 12).cast("decimal(38,12)")).as("__sw"),
        sum(round(col("__r") * col("__wc"), 12).cast("decimal(38,12)"))
          .as("__rwc"))
      .select(col("n"),
        round(col("__rw").cast("double") / col("n"), roundTo).as("ips"),
        when(col("__sw").cast("double") > 0, round(
          col("__rw").cast("double") / col("__sw").cast("double"),
          roundTo)).as("snips"),
        round(col("__rwc").cast("double") / col("n"), roundTo)
          .as("ips_clipped"))
  }

  /** UCB1 bandit scores from logged pulls: per arm, the optimistic
    * index  ucb = mean(reward) + √(2·ln N / n)  that the classic
    * upper-confidence-bound policy would rank arms by on the next
    * pull (Auer et al. 2002's deterministic exploration bonus — no
    * randomness, so the score table is exactly reproducible from the
    * log).
    *
    * Same shape discipline as the rest of this file: one hash
    * aggregation to |arms| moment rows (rewards quantized to 4 dp so
    * Σr is an exact decimal), the 1-row total-pulls table broadcast
    * back, and the index one double formula per arm. The output also
    * carries the exploration bonus separately so a dashboard can show
    * exploit vs explore contributions.
    */
  def ucb1(df: DataFrame, armCol: String, rewardCol: String,
           roundTo: Int = 6): DataFrame = {
    val arms = df.select(col(armCol).as("arm"),
        round(col(rewardCol).cast("double"), 4).cast("decimal(28,4)")
          .as("__r"))
      .groupBy("arm")
      .agg(count(lit(1)).as("n_pulls"), sum(col("__r")).as("__sr"))
    val tot = arms.agg(sum(col("n_pulls")).as("__nt"))
    arms.crossJoin(broadcast(tot))
      .withColumn("__mean",
        col("__sr").cast("double") / col("n_pulls").cast("double"))
      .withColumn("__bonus",
        sqrt(lit(2.0) * log(col("__nt").cast("double")) /
          col("n_pulls").cast("double")))
      .select(col("arm"), col("n_pulls"),
        round(col("__mean"), roundTo).as("mean_reward"),
        round(col("__bonus"), roundTo).as("explore_bonus"),
        round(col("__mean") + col("__bonus"), roundTo).as("ucb_score"))
  }

  /** Deterministic Poisson-bootstrap confidence interval for the
    * per-group mean: each of `nBoot` replicas weights every row by an
    * independent Poisson(1) draw — THE scale-correct bootstrap (one
    * pass, no global resampling; each row's weights depend only on
    * its own id, so the replica estimates are exact weighted means
    * under any partitioning).
    *
    * Draws are md5-derived, not RNG: u = hash(id|replica) ∈ [0,65536)
    * against PRECOMPUTED integer thresholds of the Poisson(1) CDF
    * (⌊65536·P(X≤j)⌋ for j=0..6, tail capped at 7) — engine-identical
    * integer comparisons, fully reproducible. Replica means are exact
    * decimal-weighted sums; the 5%/95% band is an exact percentile
    * over the `nBoot` 6 dp-snapped means.
    */
  def poissonBootstrapCi(df: DataFrame, groupCol: String, idCol: String,
                         valCol: String, nBoot: Int = 32,
                         roundTo: Int = 6): DataFrame = {
    // one md5 yields EIGHT independent 16-bit draws (the 128-bit
    // digest sliced 4 hex chars at a time), so the hash work per base
    // row is nBoot/8 digests, not nBoot — md5 dominates this operator
    // (measured 7.1 s → ~2.5 s at sf0.1 for nBoot = 32)
    val nBatch = (nBoot + 7) / 8
    val batches = df.sparkSession.range(0, nBatch.toLong)
      .select(col("id").cast("int").as("__bt"))
    // __v is the EXACT 1e4-scaled long of round(val, 4): all hot-path
    // arithmetic (4.8M replica rows at sf0.1) runs on primitive longs
    // instead of DECIMAL(28,4) (guide §2.3 narrower types). Exactness:
    // |v|·1e4 ≤ 5e9 per row, ×wt ≤ 7, ×n rows ≤ 1.5e5 ⇒ sums < 6e15 ≪
    // 2^63; and long.toDouble/1e4 is the correctly-rounded quotient =
    // the nearest double to the exact decimal value = what the
    // oracle's CAST(DECIMAL AS DOUBLE) yields, so the rounded-double
    // outputs are bit-identical.
    // Guard (ADVICE r13): the engine runs ANSI mode (Spark 4 default,
    // unchanged by any owned session), so a |round(val,4)| beyond the
    // decimal(28,4)→long range ERRORS instead of silently nulling the
    // row, and the sum bound above scales ∝ n — it reaches the 2^53
    // double-exactness margin only past ~1e9 rows PER GROUP at this
    // value domain, where the group count (5 here) would have to stay
    // fixed while the corpus grows ×10⁴; revisit the scale factor in
    // the bound if that domain ever changes.
    val base = df.select(col(groupCol).as("__g"),
      col(idCol).cast("string").as("__id"),
      (round(col(valCol).cast("double"), 4).cast("decimal(28,4)") *
        lit(10000)).cast("long").as("__v"))
    // ⌊65536·P(X≤j)⌋, X ~ Poisson(1): j = 0..6
    val cdf = Seq(24112L, 48224L, 60281L, 64299L, 65296L, 65497L, 65530L)
    val weighted = base.crossJoin(broadcast(batches))
      .withColumn("__h",
        md5(concat(col("__id"), lit("|"), col("__bt").cast("string"))))
      .select(col("__g"), col("__v"), col("__bt"),
        posexplode(array((0 until 8).map(j =>
          conv(substring(col("__h"), 1 + 4 * j, 4), 16, 10)
            .cast("long")): _*)).as(Seq("__j", "__u")))
      .withColumn("__r", col("__bt") * 8 + col("__j"))
      .filter(col("__r") < nBoot)
      .withColumn("__w", cdf.zipWithIndex.foldRight(lit(7L)) {
        case ((thr, j), elseExpr) =>
          when(col("__u") < thr, j.toLong).otherwise(elseExpr)
      })
    val repMeans = weighted.groupBy("__g", "__r")
      .agg(sum(col("__w")).as("__wn"),
        sum(col("__v") * col("__w")).as("__ws"))
      .filter(col("__wn") > 0)
      .withColumn("__m", round(col("__ws").cast("double") / lit(1e4) /
        col("__wn").cast("double"), 6))
    val band = repMeans.groupBy("__g")
      .agg(count(lit(1)).as("n_boot"),
        round(expr("percentile(__m, 0.05)"), roundTo).as("boot_lo"),
        round(expr("percentile(__m, 0.95)"), roundTo).as("boot_hi"))
    base.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("__v")).cast("double") / lit(1e4) / count(lit(1)),
          roundTo).as("mean"))
      .join(band, "__g")
      .select(col("__g").as(groupCol), col("n"), col("mean"),
        col("n_boot"), col("boot_lo"), col("boot_hi"))
  }

  /** Mixture sequential probability ratio test (mSPRT) — the always-
    * valid "peek whenever you like" companion to the fixed-horizon
    * [[liftCi]]: per time bucket, the normal-mixture likelihood ratio
    * of the running two-arm mean difference,
    * ln Λₜ = ½·ln(Vₜ/(Vₜ+τ²)) + δ̂ₜ²·τ²/(2·Vₜ·(Vₜ+τ²)) with
    * Vₜ = σ²·(1/n_A + 1/n_B), flagged against the ln(1/α) boundary.
    * Λ is a martingale under H₀, so the FIRST crossing is a valid
    * stopping rule no matter how often the dashboard refreshes.
    *
    * One daily aggregate per arm is the only shuffled object;
    * cumulative counts/sums ride [[graft.operators.MetricOps]]'s
    * range-partitioned cumsum via pivoted arm columns (exact DECIMAL
    * sums), σ² is one pooled-moment broadcast, and both the statistic
    * and the boundary are ROUNDED to 6 dp before the crossing compare
    * so a libm ulp cannot flip the flag between engines.
    */
  def msprt(df: DataFrame, armCol: String, xCol: String, yCol: String,
            armA: Any, armB: Any, tau: Double, alpha: Double = 0.05,
            roundTo: Int = 6): DataFrame = {
    val base = df.filter(col(armCol).isin(armA, armB))
      .select(col(xCol).cast("long").as("__x"),
        when(col(armCol) === lit(armA), 1L).otherwise(0L).as("__ia"),
        round(col(yCol).cast("double"), 4).cast("decimal(18,4)").as("__y"))
    val sig = base.agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(col("__y")).cast("decimal(38,4)").as("__s"),
        sum(col("__y") * col("__y")).cast("decimal(38,8)").as("__ss"))
      .select((( col("__n") * col("__ss") - col("__s") * col("__s"))
        .cast("double") /
        (col("__n") * (col("__n") - 1)).cast("double")).as("__sig2"))
    val daily = base.groupBy(col("__x"))
      .agg(sum(col("__ia")).as("__na"),
        sum(lit(1L) - col("__ia")).as("__nb"),
        sum(when(col("__ia") === 1, col("__y"))
          .otherwise(lit(0).cast("decimal(18,4)")))
          .cast("decimal(38,4)").as("__sa"),
        sum(when(col("__ia") === 0, col("__y"))
          .otherwise(lit(0).cast("decimal(18,4)")))
          .cast("decimal(38,4)").as("__sb"))
    val tau2 = tau * tau
    val bound = BigDecimal(math.log(1.0 / alpha))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    MetricOps.rangeCumSum(daily, "__x",
        Seq("__na", "__nb", "__sa", "__sb"))
      .crossJoin(broadcast(sig))
      .filter(col("__cum___na") > 0 && col("__cum___nb") > 0)
      .withColumn("__diff",
        col("__cum___sa").cast("double") / col("__cum___na") -
          col("__cum___sb").cast("double") / col("__cum___nb"))
      .withColumn("__vn", col("__sig2") *
        (lit(1.0) / col("__cum___na") + lit(1.0) / col("__cum___nb")))
      .withColumn("__llr", when(col("__vn") > 0,
        round(lit(0.5) * log(col("__vn") / (col("__vn") + tau2)) +
          col("__diff") * col("__diff") * tau2 /
            (lit(2.0) * col("__vn") * (col("__vn") + tau2)), roundTo)))
      .select(col("__x").as(xCol),
        col("__cum___na").cast("long").as("n_a"),
        col("__cum___nb").cast("long").as("n_b"),
        round(col("__diff"), roundTo).as("mean_diff"),
        col("__llr").as("log_lambda"),
        when(col("__llr") >= bound, 1).otherwise(0).as("crossed"))
  }

  /** Doubly-robust off-policy estimate — [[offPolicyValue]]'s IPS
    * with a direct-method control variate: on the eval split,
    * DR = mean( q̂(target) + ρ·(r − q̂(a)) ) with q̂ the per-action
    * mean reward fit on the MODEL split and ρ the clipped inverse
    * propensity. Unbiased if EITHER the model or the propensities are
    * right, and far lower variance than IPS when rewards are
    * predictable — the estimator production off-policy evals default
    * to.
    *
    * The q̂ table is |actions| rows, ROUNDED to 6 dp (the shared-
    * constant rule) and broadcast; propensities come from the eval
    * split itself; per-row terms snap to 12 dp and decimal-sum.
    */
  def doublyRobust(df: DataFrame, actionCol: String, rewardCol: String,
                   splitCol: String, targetAction: String,
                   clipAt: Double, roundTo: Int = 6): DataFrame = {
    val base = df.select(col(actionCol).as("__a"),
      col(rewardCol).cast("double").as("__r"),
      col(splitCol).cast("int").as("__sp"))
    val qhat = base.filter(col("__sp") === 0)
      .groupBy(col("__a"))
      .agg(round(sum(round(col("__r"), 6).cast("decimal(28,6)"))
        .cast("double") / count(lit(1)), 6).as("__q"))
    val qt = qhat.filter(col("__a") === targetAction)
      .select(col("__q").as("__qt"))
    val ev = base.filter(col("__sp") === 1)
    val prop = ev.groupBy(col("__a")).agg(count(lit(1)).as("__na"))
    val tot = prop.agg(sum(col("__na")).as("__nt"))
    ev.join(broadcast(qhat), Seq("__a"), "left")
      .join(broadcast(prop), "__a")
      .crossJoin(broadcast(tot)).crossJoin(broadcast(qt))
      .withColumn("__rho", when(col("__a") === targetAction,
        least(col("__nt").cast("double") / col("__na"), lit(clipAt)))
        .otherwise(lit(0.0)))
      .withColumn("__term", round(col("__qt") +
        col("__rho") * (col("__r") - coalesce(col("__q"), lit(0.0))),
        12).cast("decimal(38,12)"))
      .agg(count(lit(1)).as("n_eval"),
        round(first(col("__qt")), roundTo).as("direct_method"),
        round(sum(round(col("__rho") * col("__r"), 12)
          .cast("decimal(38,12)")).cast("double") / count(lit(1)),
          roundTo).as("ips_clipped"),
        round(sum(col("__term")).cast("double") / count(lit(1)),
          roundTo).as("dr"))
  }

  /** Temporal-split hygiene audit: with a time-based train/eval
    * boundary at the exact midpoint of the event-time range (integer
    * epoch-micros arithmetic — deterministic, no quantile sketch),
    * how many ENTITIES have activity on BOTH sides, per event type.
    * A straddling user leaks future behavior into training whenever
    * any user-level feature (counts, embeddings, recency) is computed
    * over the whole history — the temporal twin of the content-level
    * split-leakage audit, and the reason "split by user, not by
    * event" exists as a rule.
    *
    * Scale: one (type, entity) hash agg with before/after flags; the
    * boundary is a broadcast 1-row min/max merge; the report is a
    * |types|-row re-agg with exact half-up ppm.
    */
  def temporalSplitAudit(events: DataFrame, entityCol: String,
                         tsCol: String, typeCol: String): DataFrame = {
    val b = events.agg(min(unix_micros(col(tsCol))).as("__mn"),
        max(unix_micros(col(tsCol))).as("__mx"))
      // integer midpoint — long division, never a double quotient
      .select(expr("(__mn + __mx) div 2").as("__mid"))
    events.select(col(typeCol).as("event_type"),
        col(entityCol).as("__u"), unix_micros(col(tsCol)).as("__t"))
      .crossJoin(broadcast(b))
      .groupBy(col("event_type"), col("__u"))
      .agg(sum((col("__t") < col("__mid")).cast("long")).as("__nb"),
        sum((col("__t") >= col("__mid")).cast("long")).as("__na"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_entities"),
        sum((col("__nb") > 0 && col("__na") > 0).cast("long"))
          .as("n_straddling"),
        sum(col("__nb")).as("n_before"), sum(col("__na")).as("n_after"))
      .select(col("event_type"), col("n_entities"), col("n_straddling"),
        expr("CAST((n_straddling * 2000000 + n_entities) " +
          "div (2 * n_entities) AS BIGINT)").as("straddle_ppm"),
        col("n_before"), col("n_after"))
  }
}
