package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join shapes Spark lacks as built-ins, expressed as compositions
  * whose cost is bounded by blocking/filtering instead of all-pairs:
  * grid-blocked interval overlap and Bloom-prefiltered equi-join.
  */
object JoinOps {

  /** Interval overlap self-join per key: all pairs (a, b) of the same
    * key whose closed intervals [lo, hi] intersect, with the overlap
    * length. The quadratic trap (every pair of the same key compared)
    * is avoided by GRID BLOCKING: each interval emits the dyadic bins
    * its span covers (`sequence(lo div w, hi div w)`), candidates are
    * an equi-join on (key, bin) — a shuffled hash join whose cost is
    * Σ per-bin products, not Σ per-key² — and the exact overlap
    * predicate then verifies candidates. A pair found in several
    * shared bins is deduped by `distinct` before output.
    *
    * `binWidth` is the tuning dial: ~the typical interval length. Too
    * small → long intervals emit many bin rows (row blowup linear in
    * span/width); too large → bins collect unrelated intervals
    * (candidate blowup). Both ends stay correct — recall is exactly
    * 1.0 because two overlapping intervals necessarily share the bin
    * containing the overlap start.
    *
    * Output: (key, id_a, id_b, overlap) with id_a < id_b; overlap =
    * least(hi) − greatest(lo) ≥ 0 under closed-interval semantics.
    */
  def intervalOverlapJoin(df: DataFrame, keyCol: String, idCol: String,
                          loCol: String, hiCol: String,
                          binWidth: Long): DataFrame = {
    val binned = df.select(col(keyCol), col(idCol).as("__id"),
        col(loCol).cast("long").as("__lo"), col(hiCol).cast("long").as("__hi"))
      .withColumn("__bin", explode(sequence(
        expr(s"__lo div $binWidth"), expr(s"__hi div $binWidth"))))
    val a = binned.select(col(keyCol), col("__bin"), col("__id").as("id_a"),
      col("__lo").as("__lo_a"), col("__hi").as("__hi_a"))
    val b = binned.select(col(keyCol), col("__bin"), col("__id").as("id_b"),
      col("__lo").as("__lo_b"), col("__hi").as("__hi_b"))
    a.join(b, Seq(keyCol, "__bin"))
      .filter(col("id_a") < col("id_b") &&
        col("__lo_a") <= col("__hi_b") && col("__lo_b") <= col("__hi_a"))
      .select(col(keyCol), col("id_a"), col("id_b"),
        (least(col("__hi_a"), col("__hi_b")) -
          greatest(col("__lo_a"), col("__lo_b"))).as("overlap"))
      .distinct()
  }

  /** Inner equi-join with a broadcast Bloom pre-filter: the build
    * side's keys are folded into a `words`×32-bit Bloom filter (the
    * same md5 4-probe scheme as [[SketchOps.bloomMembership]], so the
    * construction is engine-portable), the filter words BROADCAST, and
    * the probe side drops non-matching rows MAP-SIDE — before its
    * shuffle toward the join. The output is EXACTLY the plain inner
    * join: Bloom false positives only cost wasted shuffle rows, never
    * wrong rows, because the real join still runs on what survives.
    *
    * This is the hand-rolled form of a runtime join filter: at 100 TB
    * the win is shuffling (false-positive-rate + selectivity) of the
    * fact table instead of all of it. Each of the 4 probe positions is
    * checked with its own broadcast join on the word index — no
    * explode, no extra shuffle of the probe side.
    */
  def bloomPrefilterJoin(probe: DataFrame, build: DataFrame, keyCol: String,
                         words: Int = 1024, hash: String = "xx"): DataFrame = {
    // the Bloom probe hashes the key's encoded form on each side; with
    // different key types the real join would coerce (5.00 = 5) while
    // the hashes differ — a silent FALSE NEGATIVE, so unequal types
    // are rejected instead of documented away
    require(probe.schema(keyCol).dataType == build.schema(keyCol).dataType,
      s"bloomPrefilterJoin: $keyCol types differ (" +
        s"${probe.schema(keyCol).dataType} vs ${build.schema(keyCol).dataType})" +
        " — hash probes would miss coerced matches")
    val mBits = words * 32
    // Default hash is xxhash64 (one codegen'd mix per position); the
    // md5 family stays available for parity with oracle-pinned filters.
    // The oracle for the JOIN checks output semantics, and the Bloom
    // no-false-negative guarantee needs only build/probe consistency —
    // which bloomFilterWords(hash) shares.
    val filterWords = SketchOps.bloomFilterWords(build, keyCol, words, hash)
    val pos = SketchOps.bloomPositions(col(keyCol), mBits, hash)
    val prefiltered = (0 until 4).foldLeft(probe) { (df, i) =>
      val w = filterWords.select(col("__w").as(s"__w$i"),
        col("__mask").as(s"__mask$i"))
      df.withColumn(s"__p$i", pos(i))
        .withColumn(s"__w$i", (col(s"__p$i") / 32).cast("long"))
        .join(broadcast(w), Seq(s"__w$i"), "left")
        .filter(coalesce(col(s"__mask$i").bitwiseAND(
            expr(s"shiftleft(CAST(1 AS BIGINT), CAST(__p$i % 32 AS INT))")) =!= 0,
          lit(false)))
        .drop(s"__p$i", s"__w$i", s"__mask$i")
    }
    prefiltered.join(build, Seq(keyCol))
  }

  /** Incremental (delta) join maintenance: given the previously
    * MATERIALIZED join of the base sides and this batch's deltas,
    * produce the maintained join
    *   J' = J₀ ∪ (ΔA ⋈ B₀) ∪ (A₀ ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
    * — the algebraic identity (A₀∪ΔA) ⋈ (B₀∪ΔB) expanded so the
    * base-base term is READ from storage instead of recomputed. At
    * 100 TB this is the difference between re-shuffling two full fact
    * tables every batch and shuffling only |Δ|-proportional rows: the
    * three delta joins each carry at least one delta side, and the
    * stored J₀ streams through untouched (no exchange — it is already
    * the answer for the old rows).
    *
    * Inputs must share the join-key columns `keys`; the non-key
    * columns of A and B must be disjoint (usual join contract). The
    * caller aggregates downstream (and at scale stores J' partitioned
    * the same way as J₀ so the union is a file append, not a rewrite).
    * Correctness contract (oracle-checked): J' row-for-row equals the
    * full recompute join of (A₀∪ΔA) with (B₀∪ΔB).
    */
  def incrementalJoin(baseJoined: DataFrame,
                      baseA: DataFrame, deltaA: DataFrame,
                      baseB: DataFrame, deltaB: DataFrame,
                      keys: Seq[String]): DataFrame =
    baseJoined
      .unionByName(deltaA.join(baseB, keys))
      .unionByName(baseA.join(deltaB, keys))
      .unionByName(deltaA.join(deltaB, keys))
}
