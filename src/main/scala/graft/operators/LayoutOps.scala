package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering keys for
  * file-skipping at scale (the OPTIMIZE ZORDER analogue).
  *
  * At 100 TB the scan is the dominant cost, and min/max file statistics
  * prune files only when the data is clustered on the filter columns. A
  * Z-order (Morton) key interleaves the bits of several columns so that
  * `repartitionByRange(zCol).sortWithinPartitions(zCol)` co-locates rows
  * that are close in EVERY dimension — range predicates on any of the
  * interleaved columns then touch a bounded fraction of files, instead
  * of all files (which is what single-column sorting does to the other
  * columns).
  */
object LayoutOps {

  /** Morton/Z-value: interleave the low `bits` bits of x and y
    * (x in even positions, y in odd). Pure integer arithmetic —
    * the disjoint-bit terms are combined with `+` (equal to bitwise-or
    * here), which reproduces identically in any engine with shifts.
    */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _).cast("long")

  /** Per-Z-range clustering report: bucket rows by the top bits of the
    * z-value and report, per bucket, the row count and the min/max of
    * each source dimension. On well-clustered data every bucket spans a
    * narrow box in (x, y) — exactly the property that makes file-level
    * min/max stats selective. One hash aggregation on the bucket key.
    */
  def zOrderStats(df: DataFrame, xCol: String, yCol: String,
                  bits: Int, bucketShift: Int): DataFrame =
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .groupBy(shiftright(col("__z"), bucketShift).cast("long").as("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"))

  /** Hilbert-curve index of (x, y) on a 2^bits × 2^bits grid — the
    * stronger clustering key: unlike the Morton [[zValue]], consecutive
    * Hilbert indices are ALWAYS grid-adjacent (no 2^k "seam jumps"), so
    * range boxes touch fewer key runs and file-level min/max stats
    * prune harder on both dimensions.
    *
    * The standard top-down quadrant walk (d += s²·((3rx)⊕ry), then
    * reflect about the full grid and swap when ry = 0) unrolled over
    * bit levels as a LINEAR chain of column expressions — pure integer
    * shifts/xors, identical in any engine, fully codegen'd, map-only.
    * Input columns must already lie in [0, 2^bits).
    */
  def hilbertKey(df: DataFrame, xCol: String, yCol: String, bits: Int,
                 outCol: String): DataFrame = {
    val nMinus1 = (1L << bits) - 1
    var cur = df
      .withColumn("__hx", col(xCol).cast("long"))
      .withColumn("__hy", col(yCol).cast("long"))
      .withColumn(outCol, lit(0L))
    for (i <- bits - 1 to 0 by -1) {
      val s = 1L << i
      val rx = shiftright(col("__hx"), i).bitwiseAND(lit(1L))
      val ry = shiftright(col("__hy"), i).bitwiseAND(lit(1L))
      cur = cur
        .withColumn(outCol, col(outCol) +
          lit(s * s) * (rx * 3).bitwiseXOR(ry))
        .withColumn("__nx", when(ry === 0,
            when(rx === 1, lit(nMinus1) - col("__hy"))
              .otherwise(col("__hy"))).otherwise(col("__hx")))
        .withColumn("__hy", when(ry === 0,
            when(rx === 1, lit(nMinus1) - col("__hx"))
              .otherwise(col("__hx"))).otherwise(col("__hy")))
        .withColumn("__hx", col("__nx"))
    }
    cur.drop("__hx", "__hy", "__nx")
  }

  /** File-skipping simulator — the advisor that QUANTIFIES a layout
    * before an expensive rewrite: rows are ranked by each candidate
    * clustering key, tiled into `nFiles` equal files (exactly what a
    * `repartitionByRange(key).sortWithinPartitions(key)` write
    * produces), per-file min/max zone maps are computed for the filter
    * column, and the report says what fraction of files a range
    * predicate [lo, hi] skips under each layout.
    *
    * Ranking rides [[MetricOps.globalRank]] (range-partitioned — no
    * single-partition window at any table size); file ids are exact
    * integer math ((r−1)·F div N); zone maps are one hash agg on the
    * file id; the final report is F rows per layout.
    */
  def pruneSimulation(df: DataFrame, layouts: Seq[(String, Column)],
                      tieCol: String, statCol: String, lo: Long, hi: Long,
                      nFiles: Int): DataFrame = {
    // Pin the input once: every layout re-reads it (and candidate keys
    // like a Hilbert chain are 40-column expression walks — computing
    // them once per layout, not once per layout × consumer, halved the
    // advisor's wall time). The row count is layout-independent; as a
    // literal it also spares each branch a broadcast-count subtree.
    val base = df.localCheckpoint(true)
    val nRows = base.count()
    layouts.map { case (name, key) =>
      val keyed = base.withColumn("__lk", key.cast("long"))
      val files = MetricOps.globalRank(keyed, "__lk", tieCol)
        .withColumn("__file",
          expr(s"(r - 1) * $nFiles div ${nRows}L").cast("long"))
        .groupBy(col("__file"))
        .agg(min(col(statCol)).as("__mn"), max(col(statCol)).as("__mx"))
      files.agg(count(lit(1)).as("n_files"),
          sum(when(col("__mn") <= hi && col("__mx") >= lo, 1L)
            .otherwise(0L)).as("files_hit"))
        .select(lit(name).as("layout"), col("n_files"), col("files_hit"),
          round(lit(1.0) - col("files_hit").cast("double") /
            col("n_files"), 6).as("prune_frac"))
    }.reduce(_ unionAll _)
  }

  /** Rendezvous (highest-random-weight) placement: each key goes to the
    * worker with the max md5(key:worker) score — the consistent-
    * placement scheme whose defining property is MINIMAL MOVEMENT:
    * growing N workers to N+1 relocates only ~1/(N+1) of keys (modulo
    * hashing reshuffles ~all of them). md5-only, so the assignment is
    * identical in any engine and across any partitioning.
    *
    * Scale shape: keys × workers is a broadcast nested-loop over an
    * N-row worker list (N is the CLUSTER size, not data size) followed
    * by one argmax hash agg on the key.
    */
  /** Small-file compaction planner: pack files (in layout-key order, so
    * compaction preserves clustering) into ≈`targetBytes` bins by the
    * running-sum rule bin = ⌊(cum − size)/target⌋ (a bin may overflow
    * by at most one trailing file — the rule never splits one) — one
    * [[MetricOps.rangeCumSum]] pass (range-partitioned, no global
    * window), one hash agg on the bin id, one report row. The advisor
    * a 100 TB table runs before an OPTIMIZE/compact pass: how many
    * files fold into how many bins, and how full the bins come out.
    * Files larger than the target each keep their own bin(s) — the
    * rule never splits a file.
    */
  def compactionPlan(files: DataFrame, fileCol: String, bytesCol: String,
                     targetBytes: Long, roundTo: Int = 6): DataFrame = {
    val f = files.select(col(fileCol).as("__f"),
      col(bytesCol).cast("long").as("__b"))
    val cum = MetricOps.rangeCumSum(f, "__f", Seq("__b"))
      .withColumn("__bin",
        expr(s"(__cum___b - __b) div ${targetBytes}L"))
    val bins = cum.groupBy(col("__bin"))
      .agg(sum(col("__b")).as("__bb"))
    val fileStats = f.agg(count(lit(1)).as("n_files"),
      sum(col("__b")).as("total_bytes"),
      sum(when(col("__b") * 2 < targetBytes, 1L).otherwise(0L))
        .as("n_small"))
    fileStats.crossJoin(broadcast(
        bins.agg(count(lit(1)).as("n_bins"), max(col("__bb")).as("max_bin_bytes"))))
      .select(col("n_files"), col("n_small"), col("total_bytes"),
        col("n_bins"), col("max_bin_bytes"),
        round(col("total_bytes").cast("double") /
          (col("n_bins") * targetBytes), roundTo).as("fill_frac"))
  }

  def rendezvousAssign(df: DataFrame, keyCol: String, nWorkers: Int,
                       outCol: String): DataFrame = {
    val workers = df.sparkSession.range(nWorkers)
      .select(col("id").cast("long").as("__w"))
    df.crossJoin(broadcast(workers))
      .withColumn("__score", md5(concat(col(keyCol).cast("string"),
        lit(":"), col("__w").cast("string"))))
      .groupBy(df.columns.map(col): _*)
      .agg(max(struct(col("__score"), col("__w"))).as("__m"))
      .withColumn(outCol, col("__m.__w"))
      .drop("__m")
  }
}
