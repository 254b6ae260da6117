package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftExpr

import graft.functions.{CellIndex, NearestCells}

/** Vector-similarity operators: brute-force cosine top-k (the exact
  * baseline), sign-bucketed IVF ANN (the scale path), and
  * embedding-cosine near-dup.
  *
  * Ref: the reference's kNN retrieval is Elasticsearch HNSW cosine
  * (online/utils/es_caller.py:39-54, offline_to_online/recall/
  * s2_item_to_es.py:36-41). Re-expressed relationally: dot/norm as array
  * higher-order functions (codegen'd, no UDF), top-k as a row_number
  * window.
  *
  * Scale: brute force is O(n·m) pairs — correct as the exactness oracle
  * and for ≤10⁴-row sides; the production path at 100 TB is the bucketed
  * variant below (equi-join on bucket key ⇒ shuffled hash join, cost
  * Σ bucket²) or MLlib BucketedRandomProjectionLSH, which this operator
  * set is shaped to drop into (same (id, emb, norm) signature table).
  */
object SimilarityOps {

  /** Left-to-right double-precision dot product of two array columns,
    * via the native codegen'd [[graft.functions.DotProduct]] expression
    * (bit-identical to the sequential HOF form and to DuckDB's
    * list_dot_product, ~8× faster on the brute-force pair stage).
    */
  def dot(a: String, b: String): Column = expr(s"graft_dot($a, $b)")

  /** (id, emb double[], nrm) signature table — norms computed once per
    * row, before any join, so the pair stage multiplies scalars.
    */
  def normalized(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    df.select(col(idCol).as("id"),
        expr(s"transform($embCol, x -> CAST(x AS DOUBLE))").as("emb"))
      .withColumn("nrm", sqrt(dot("emb", "emb")))
  }

  /** All directed (vec_id, neighbor_id, sim) pairs of a
    * self-comparison. Deliberately NOT the halved-and-mirrored form:
    * mirroring needs a generator (or a lineage-doubling union) that
    * breaks whole-stage codegen, which measures slower than evaluating
    * the codegen'd dot for both directions.
    */
  private def pairSim(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("id").as("vec_id"), col("emb").as("a_emb"), col("nrm").as("a_nrm"))
      .crossJoin(b.select(col("id").as("neighbor_id"), col("emb").as("b_emb"),
        col("nrm").as("b_nrm")))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("sim", dot("a_emb", "b_emb") / (col("a_nrm") * col("b_nrm")))
      .select("vec_id", "neighbor_id", "sim")

  /** Bounded top-k selection over a (vec_id, neighbor_id, sim) pair
    * stream: a TopKAggregator hash aggregation, not a window — map-side
    * partials keep ≤k candidates per vector per partition, so the pair
    * stream never shuffles or sorts; only k·|vectors| survivor rows
    * move. Bit-identical to the window row_number form
    * (TopKAggregatorSpec). Shared by every kNN variant so the
    * tiebreak/rounding contract lives in one place.
    */
  private def selectTopK(pairs: DataFrame, k: Int): DataFrame =
    // null sims (null/mismatched embeddings) are dropped before the
    // typed aggregator — its primitive Double input cannot carry null;
    // the window form would rank them last (desc_nulls_last), so the
    // results differ only when a group has fewer than k non-null sims.
    pairs.filter(col("sim").isNotNull)
      .groupBy(col("vec_id"))
      .agg(graft.functions.TopKAggregator.topK(k, col("sim"), col("neighbor_id")).as("top"))
      .select(col("vec_id"), explode(col("top")).as("t"))
      .select(col("vec_id"), col("t.id").as("neighbor_id"),
        round(col("t.score"), 6).as("sim"))

  /** Count-stepped sign-bucket width schedule — THE scale dial every
    * bucketed ANN consumer rides: +2 bits at each 4× count threshold
    * (1e3, 4e3, 16e3, 64e3, 256e3, 1.024e6), so the cell count grows
    * ∝ n and the average cell stays ~16 vectors at ANY corpus size —
    * the pair stage is (bits+1)·cell·n ≈ n·log n, never Σ cell² ≈ n².
    * Round-10 probe: the coarser 4/6/8 schedule capped at 8 bits left
    * 20k vectors in 78-vector cells and the mutual-kNN pair stage at
    * ×18-25 per 10× data; per-4× stepping holds the family in the
    * linear band (BENCHLOG round-10 table). The 16-bit cap (n ≥ 1.024e6)
    * still fits the 64-dim sign quantizer and the INT bucket id; past
    * ~4M vectors per index shard, shard the index (the 100 TB layout)
    * rather than widening further. Recall at the fixed ~16-vector cell
    * is measured per corpus by q438/q439. The count is ONE driver-side
    * scalar (the planner-statistic read, same sanctioned class as the
    * 1-row train-stats collects); everything downstream is the standard
    * probe equi-join. Oracle-deterministic: the DuckDB twins compute
    * the same width from count(*) (the q436 `bb` CTE), so both engines
    * pick the same geometry at every SF.
    */
  def adaptiveSignBits(df: DataFrame): Int = signBitsForCount(df.count())

  /** The [[adaptiveSignBits]] schedule as a pure function of the count
    * — for callers that already hold `n` (the IVF dials derive kCent,
    * shardBits AND the training-sample modulus from one count, not
    * three scans).
    */
  def signBitsForCount(n: Long): Int =
    4 + 2 * Seq(1000L, 4000L, 16000L, 64000L, 256000L, 1024000L).count(n >= _)

  /** Training-sample modulus for the IVF codebook: keep ~32·kCent
    * vectors in the md5-sampled Lloyd slice (`u % mod = 0` on the
    * 32-bit md5 draw — the q397 1-in-N idiom). Under the width
    * schedule kCent ∝ √n, so the slice grows only ∝ √n and each Lloyd
    * round costs ~32·kCent² ∝ n distance rows REGARDLESS of how the
    * corpus grows — the fix for the flat trainer's measured ×10 probe
    * ratio (n·kCent with kCent ∝ √n is n^1.5 when every round sweeps
    * the full corpus). mod = 1 below ~256·kCent vectors (the gate
    * sf0.001/sf0.01 regime), so tiny corpora still train on everything.
    */
  def ivfSampleMod(n: Long, kCent: Int): Int =
    math.max(1L, n / (kCent * 32L)).toInt

  /** Sign-pattern coarse quantizer over the leading dimensions. */
  private def signBucket(signBits: Int): Column =
    (0 until signBits)
      .map(j => expr(s"CAST(emb[$j] > 0 AS INT) * ${1 << j}"))
      .reduce(_ + _)

  /** Brute-force cosine top-k per query vector, deterministic tiebreak on
    * neighbor id. Exact-answer baseline for any ANN variant.
    */
  def cosineTopK(df: DataFrame, idCol: String, embCol: String, k: Int): DataFrame = {
    val n = normalized(df, idCol, embCol)
    selectTopK(pairSim(n, n), k)
  }

  /** Mutual k-NN pairs: (a, b) kept iff b is in a's cosine top-k AND
    * a is in b's — the symmetric-neighborhood filter that seeds
    * clustering/agreement graphs (hub vectors survive only where the
    * affinity is reciprocal). Built on [[cosineTopK]]'s survivor table
    * (k·|vectors| rows), so the mutual check is a self-join of that
    * SMALL table on (a,b) = (b,a) — never a second pair sweep. Cosine
    * is symmetric here bit-for-bit (the codegen'd dot accumulates in
    * index order on both sides; double multiply commutes), so each
    * surviving pair carries one sim.
    */
  def mutualKnn(df: DataFrame, idCol: String, embCol: String,
                k: Int): DataFrame =
    mutualPairs(cosineTopK(df, idCol, embCol, k))

  /** Mutual k-NN over the multi-probe IVF candidate lists —
    * [[mutualKnn]]'s 100 TB form: the top-k survivor table comes from
    * [[annTopKMultiProbe]] (equi-join on the sign-bucket cell id, no
    * all-pairs sweep anywhere), then the identical reciprocal check.
    * The candidate set is deterministic (data-independent sign
    * quantizer), so the result is exactly reproducible cross-engine —
    * the property that lets this scale path carry its own oracle
    * instead of leaning on the exact baseline. Downstream graph ops
    * (label propagation, modularity, rec-list metrics) compose on this
    * edge list unchanged.
    */
  def mutualKnnBucketed(df: DataFrame, idCol: String, embCol: String,
                        k: Int, signBits: Int = 4): DataFrame =
    mutualPairs(annTopKMultiProbe(df, idCol, embCol, k, signBits))

  /** Reciprocal-neighbor filter shared by the exact and bucketed
    * mutual-kNN forms: keep (a,b) iff both directions survive the
    * top-k, emitting each undirected pair once (id_a < id_b). The
    * self-join runs on the SMALL k·|vectors| survivor table.
    */
  private def mutualPairs(top: DataFrame): DataFrame = {
    val rev = top.select(col("neighbor_id").as("vec_id"),
      col("vec_id").as("neighbor_id"))
    top.join(rev, Seq("vec_id", "neighbor_id"), "left_semi")
      .filter(col("vec_id") < col("neighbor_id"))
      .select(col("vec_id").as("id_a"), col("neighbor_id").as("id_b"),
        col("sim"))
  }

  /** Embedding-cosine near-dup: all pairs above a similarity threshold
    * (id_a < id_b). Same signature table; at scale the pair generation
    * swaps to `annTopK`'s bucketed join or LSH.
    */
  def embeddingNearDup(df: DataFrame, idCol: String, embCol: String,
                       threshold: Double): DataFrame = {
    val n = normalized(df, idCol, embCol)
    pairSim(n, n)
      .filter(col("vec_id") < col("neighbor_id") && col("sim") > threshold)
      .select(col("vec_id").as("id_a"), col("neighbor_id").as("id_b"),
        round(col("sim"), 6).as("sim"))
  }

  /** Bucketed embedding near-dup — the 100 TB path for
    * [[embeddingNearDup]]: candidate pairs come from the multi-probe
    * sign-bucket equi-join (each left vector probes its own cell plus
    * the `signBits` Hamming-1 cells), then the exact cosine threshold
    * is applied to candidates only. No all-pairs cross join anywhere:
    * the join is a shuffled hash join on the cell id with cost
    * Σ cell·probe ≈ n²·(signBits+1)/2^signBits, and the trailing
    * distinct removes pairs discovered via more than one probe cell.
    * Recall loss vs the exact form: only pairs differing in ≥2 leading
    * sign bits are missed — precisely the IVF multi-probe contract.
    */
  def embeddingNearDupBucketed(df: DataFrame, idCol: String, embCol: String,
                               threshold: Double, signBits: Int = 4): DataFrame = {
    val n = normalized(df, idCol, embCol).withColumn("bucket", signBucket(signBits))
    val probes = expr(
      s"array(bucket, ${(0 until signBits).map(j => s"CAST(bucket AS INT) ^ ${1 << j}").mkString(", ")})")
    val a = n.select(col("id").as("id_a"), col("emb").as("a_emb"),
      col("nrm").as("a_nrm"), explode(probes).as("bucket"))
    val b = n.select(col("id").as("id_b"), col("emb").as("b_emb"),
      col("nrm").as("b_nrm"), col("bucket"))
    a.join(b, "bucket")
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", dot("a_emb", "b_emb") / (col("a_nrm") * col("b_nrm")))
      .filter(col("sim") > threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
      .distinct()
  }

  /** Per-cell centroids of the IVF sign-bucket quantizer: mean embedding
    * component per (cell, dimension) — the index-build step of a real
    * IVF (and the E-step shape of distributed k-means: assign is the
    * bucket equi-join, update is this aggregation). One posexplode +
    * one hash aggregation on (bucket, dim); no vector ever crosses the
    * wire whole.
    */
  def ivfCentroids(df: DataFrame, idCol: String, embCol: String,
                   signBits: Int = 4): DataFrame = {
    val n = normalized(df, idCol, embCol).withColumn("bucket", signBucket(signBits))
    n.select(col("bucket").cast("int").as("bucket"),
        posexplode(col("emb")).as(Seq("dim", "v")))
      .groupBy("bucket", "dim")
      .agg(count(lit(1)).as("n_vecs"), round(avg(col("v")), 6).as("centroid"))
  }

  /** Multi-probe IVF ANN: like [[annTopK]], but each query vector also
    * probes the `signBits` Hamming-1 neighbor cells (one sign bit
    * flipped) — the standard recall/cost dial: cost grows
    * ×(signBits+1)/2^signBits of brute force, recall approaches exact
    * because near neighbors that straddle one quantization hyperplane
    * are found. Probing stays an equi-join on the cell id (the query
    * side explodes its probe list; the index side is stored once).
    *
    * Measured recall@10 vs the exact baseline on the embeddings
    * fixture (LshRecallSpec): signBits 1/2/3/4 → 1.00/0.83/0.65/0.48.
    * The dial, not a defect — pick signBits for the recall/cost point;
    * for ≥0.9 recall at higher selectivity use more probe cells
    * (Hamming ≤ 2) or MLlib's multi-table BucketedRandomProjectionLSH
    * (≈0.93 with 3 tables on the same fixture).
    */
  def annTopKMultiProbe(df: DataFrame, idCol: String, embCol: String, k: Int,
                        signBits: Int = 4): DataFrame = {
    val n = normalized(df, idCol, embCol).withColumn("bucket", signBucket(signBits))
    val probes = expr(
      s"array(bucket, ${(0 until signBits).map(j => s"CAST(bucket AS INT) ^ ${1 << j}").mkString(", ")})")
    val a = n.select(col("id").as("vec_id"), col("emb").as("a_emb"),
        col("nrm").as("a_nrm"), explode(probes).as("bucket"))
    val b = n.select(col("id").as("neighbor_id"), col("emb").as("b_emb"),
      col("nrm").as("b_nrm"), col("bucket"))
    val pairs = a.join(b, "bucket")
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("sim", dot("a_emb", "b_emb") / (col("a_nrm") * col("b_nrm")))
    selectTopK(pairs, k)
  }

  /** Scale-ADAPTIVE multi-probe ANN top-k: the sign-bucket width
    * follows corpus size on [[adaptiveSignBits]]'s per-4× stepped
    * schedule — +2 bits at each of 1e3/4e3/16e3/64e3/256e3/1.024e6
    * vectors, capped at 16 bits — so the cell count grows ∝ n, the
    * mean cell stays ~16 vectors at any corpus size, and the candidate
    * stage stays ~n·log n instead of Σ cell² ≈ n² (the round-10
    * BENCHLOG migration that moved this family from ×9.6–×61 at 10×
    * data into the ×0.9–×3.8 linear band). Recall at the fixed cell
    * size is recovered by the multi-probe levels (the q332/q340 dial,
    * measured in q438); past the 16-bit cap, shard the index (ivfAnnTopKSharded, q441).
    * The count is ONE driver-side scalar (the planner-statistic read,
    * same sanctioned class as the 1-row train-stats collects);
    * everything downstream is the standard probe equi-join.
    */
  def annTopKAdaptive(df: DataFrame, idCol: String, embCol: String,
                      k: Int): DataFrame =
    annTopKMultiProbe(df, idCol, embCol, k, adaptiveSignBits(df))

  /** Hamming-≤2 multi-probe IVF ANN — the next notch of the
    * recall/cost dial after [[annTopKMultiProbe]]: each query vector
    * probes its own cell, every Hamming-1 cell, AND every Hamming-2
    * cell (1 + b + b(b−1)/2 probes), so only neighbors straddling ≥3
    * quantization hyperplanes are missed. Still a pure equi-join on
    * the cell id — the probe list explodes on the query side only, the
    * index side is stored once. At small signBits this approaches
    * brute-force cost (11/16 cells at b=4); the production setting is
    * b=8..12 where (1+b+b(b−1)/2)/2^b stays ≤ 0.2 — the dial is
    * signBits, H≤2 buys the recall at a fixed multiple.
    */
  def annTopKMultiProbe2(df: DataFrame, idCol: String, embCol: String,
                         k: Int, signBits: Int = 4): DataFrame = {
    val n = normalized(df, idCol, embCol).withColumn("bucket", signBucket(signBits))
    val h1 = (0 until signBits).map(j => s"CAST(bucket AS INT) ^ ${1 << j}")
    val h2 = for {
      i <- 0 until signBits; j <- i + 1 until signBits
    } yield s"CAST(bucket AS INT) ^ ${(1 << i) | (1 << j)}"
    val probes = expr(s"array(bucket, ${(h1 ++ h2).mkString(", ")})")
    val a = n.select(col("id").as("vec_id"), col("emb").as("a_emb"),
      col("nrm").as("a_nrm"), explode(probes).as("bucket"))
    val b = n.select(col("id").as("neighbor_id"), col("emb").as("b_emb"),
      col("nrm").as("b_nrm"), col("bucket"))
    val pairs = a.join(b, "bucket")
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("sim", dot("a_emb", "b_emb") / (col("a_nrm") * col("b_nrm")))
    selectTopK(pairs, k)
  }

  /** IVF-style ANN: partition vectors into 2^`signBits` coarse cells by
    * the sign pattern of the leading dimensions (a deterministic,
    * data-independent quantizer), then exact cosine top-k WITHIN each
    * cell. The pair stage is an equi-join on the cell id — a shuffled
    * hash join whose cost is Σ cell², ~n²/2^signBits for balanced cells.
    * Trades recall (cross-cell neighbors are missed) for a 2^signBits
    * speedup — the same contract as IVF nprobe=1.
    */
  def annTopK(df: DataFrame, idCol: String, embCol: String, k: Int,
              signBits: Int = 4): DataFrame = {
    val n = normalized(df, idCol, embCol).withColumn("bucket", signBucket(signBits))
    val a = n.select(col("id").as("vec_id"), col("emb").as("a_emb"),
      col("nrm").as("a_nrm"), col("bucket"))
    val b = n.select(col("id").as("neighbor_id"), col("emb").as("b_emb"),
      col("nrm").as("b_nrm"), col("bucket"))
    val pairs = a.join(b, "bucket")
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("sim", dot("a_emb", "b_emb") / (col("a_nrm") * col("b_nrm")))
    selectTopK(pairs, k)
  }

  /** kNN label-agreement audit — the noisy-label screen (the
    * neighborhood-consensus signal behind confident-learning-style
    * cleaning): for each vector, what fraction of its approximate
    * nearest neighbors carries the SAME label? Rows with low agreement
    * are the mislabeled-example candidates a labeling pass reviews
    * first. Neighbors come from the Hamming-≤1 multi-probe sign-bucket
    * candidates ([[annTopKMultiProbe]] — equi-join, never all-pairs);
    * the label comparison and per-anchor reduce are one broadcast-free
    * co-keyed join plus one hash agg.
    */
  def labelAgreement(df: DataFrame, idCol: String, embCol: String,
                     labelCol: String, k: Int,
                     signBits: Int = 4): DataFrame = {
    val nn = annTopKMultiProbe(df, idCol, embCol, k, signBits)
    val lab = df.select(col(idCol), col(labelCol))
    nn.join(lab.select(col(idCol).as("vec_id"),
        col(labelCol).as("__al")), Seq("vec_id"))
      .join(lab.select(col(idCol).as("neighbor_id"),
        col(labelCol).as("__bl")), Seq("neighbor_id"))
      .groupBy(col("vec_id"), col("__al"))
      .agg(count(lit(1)).as("n_neighbors"),
        sum(when(col("__al") === col("__bl"), lit(1L)).otherwise(lit(0L)))
          .as("n_same"))
      .select(col("vec_id"), col("__al").as("label"),
        col("n_neighbors"), col("n_same"),
        round(col("n_same").cast("double") / col("n_neighbors"), 6)
          .as("agreement"))
  }

  /** IVF cell-balance advisor: the signBits dial's workload report.
    * For each quantizer width b ∈ 1..`maxBits`, the sign-pattern cells
    * the corpus actually lands in: non-empty cell count, the largest
    * cell, and the within-cell pair work Σ n·(n−1)/2 — exactly the
    * pair rows [[annTopK]]'s equi-join evaluates at that width. The
    * caller reads off the b where pair work is affordable and the max
    * cell is not a de-facto cross join, then cross-references the
    * recall curve (LshRecallSpec) for the quality side of the trade.
    *
    * Scale: one pass — each vector emits `maxBits` (width, cell) rows
    * (a row-local explode of nested sign prefixes, no shuffle until
    * the one (width, cell) hash agg), then a `maxBits`-row reduce.
    */
  def ivfCellAdvisor(df: DataFrame, idCol: String, embCol: String,
                     maxBits: Int = 6): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    val n = normalized(df, idCol, embCol)
    val cfgs = (1 to maxBits).map { b =>
      struct(lit(b).as("sign_bits"), signBucket(b).as("cell"))
    }
    n.select(explode(array(cfgs: _*)).as("c"))
      .select(col("c.sign_bits").as("sign_bits"), col("c.cell").as("cell"))
      .groupBy("sign_bits", "cell").agg(count(lit(1)).as("__n"))
      .groupBy("sign_bits").agg(
        count(lit(1)).as("n_cells"),
        max(col("__n")).as("max_cell"),
        sum(expr("__n * (__n - 1) div 2")).as("est_pairs"))
  }

  /** Hard-negative mining for contrastive training-pair construction:
    * for each anchor, the k most-similar vectors carrying a DIFFERENT
    * label — the negatives that sit closest to the decision boundary
    * and teach a contrastive/triplet objective the most (the standard
    * in-batch-negatives upgrade). Candidates come from the same
    * Hamming-≤1 multi-probe sign-bucket equi-join as
    * [[annTopKMultiProbe]] — never an all-pairs sweep — with the
    * label-mismatch filter applied BEFORE top-k selection, so the k
    * slots are spent on true negatives only.
    */
  def hardNegatives(df: DataFrame, idCol: String, embCol: String,
                    labelCol: String, k: Int, signBits: Int = 4): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    val n = df.select(col(idCol).as("id"), col(labelCol).as("lbl"),
        expr(s"transform($embCol, x -> CAST(x AS DOUBLE))").as("emb"))
      .withColumn("nrm", sqrt(dot("emb", "emb")))
      .withColumn("bucket", signBucket(signBits))
    val h1 = (0 until signBits).map(j => s"CAST(bucket AS INT) ^ ${1 << j}")
    val probes = expr(s"array(bucket, ${h1.mkString(", ")})")
    val a = n.select(col("id").as("vec_id"), col("lbl").as("a_lbl"),
      col("emb").as("a_emb"), col("nrm").as("a_nrm"),
      explode(probes).as("bucket"))
    val b = n.select(col("id").as("neighbor_id"), col("lbl").as("b_lbl"),
      col("emb").as("b_emb"), col("nrm").as("b_nrm"), col("bucket"))
    val pairs = a.join(b, "bucket")
      .filter(col("vec_id") =!= col("neighbor_id") &&
        col("a_lbl") =!= col("b_lbl"))
      .withColumn("sim", dot("a_emb", "b_emb") / (col("a_nrm") * col("b_nrm")))
    selectTopK(pairs, k)
  }

  /** Greedy k-center coreset selection (Gonzalez 1985 farthest-point
    * traversal; the diversity-driven data-selection baseline — e.g.
    * coreset selection for efficient training): seed with the minimum
    * id, then repeatedly add the vector whose cosine distance to its
    * NEAREST already-chosen center is largest (ties → smallest id).
    * The k centers cover the corpus within 2× the optimal k-center
    * radius — the classic guarantee — and `dist` reports the coverage
    * radius as each center is added (monotone non-increasing: the
    * radius the corpus would have if selection stopped there).
    *
    * Scale: k passes over the corpus, each one a BROADCAST of the ≤k
    * chosen centers + a map-side min + one argmax agg (max of a
    * (dist, −id) struct — order-independent, no window, no sort). The
    * only driver-side reads are k single-row argmax results (the
    * sanctioned tiny-scalar class). Distances compare RAW doubles —
    * graft_dot is bit-identical to the oracle's list_dot_product, so
    * the argmax agrees across engines (the q26 ordering precedent);
    * only the reported radius is rounded (6 dp, zero pinned to +0.0).
    */
  def kCenterSelect(df: DataFrame, idCol: String, embCol: String,
                    k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = normalized(df, idCol, embCol)
    val seedRow = n.agg(min(col("id"))).head()
    if (seedRow.isNullAt(0))
      return Seq.empty[(Int, Long, Option[Double])]
        .toDF("sel_round", "vec_id", "dist")
    var ids = Vector(seedRow.getLong(0))
    val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Option[Double])](
      (0, ids.head, None))
    var r = 1
    var exhausted = false
    while (r < k && !exhausted) {
      val centers = n.filter(col("id").isin(ids: _*))
        .select(col("emb").as("c_emb"), col("nrm").as("c_nrm"))
      val dmin = n.crossJoin(broadcast(centers))
        .withColumn("__d",
          lit(1.0) - dot("emb", "c_emb") / (col("nrm") * col("c_nrm")))
        .groupBy(col("id")).agg(min(col("__d")).as("__d"))
      val top = dmin.filter(!col("id").isin(ids: _*))
        .agg(max(struct(col("__d"), (-col("id")).as("__nid"))).as("m"))
        .head()
      if (top.isNullAt(0)) exhausted = true
      else {
        val m = top.getStruct(0)
        val (d, id) = (m.getDouble(0), -m.getLong(1))
        ids = ids :+ id
        // rounded difference — pin −0.0 (sim can exceed 1 by an ulp);
        // NaN (zero-norm input) passes through, it only arises in
        // degenerate sweeps where no oracle runs
        val dr = if (java.lang.Double.isNaN(d)) Double.NaN
          else BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble
        out += ((r, id, Some(if (dr == 0.0) 0.0 else dr)))
        r += 1
      }
    }
    out.toSeq.toDF("sel_round", "vec_id", "dist")
  }

  /** Johnson–Lindenstrauss random projection to `outDim` dims with a
    * ±1 sign matrix (Achlioptas 2003: database-friendly random
    * projections — sign matrices preserve distances like Gaussians at
    * a fraction of the compute). The sign s(i,j) derives from md5 of
    * "i:j" — engine-portable configuration, not data, so the projection
    * is reproducible everywhere and across runs (the repo-wide
    * md5-only-hashing invariant).
    *
    * Map-only: the 64×outDim sign matrix folds into literal arrays at
    * plan build, each output dim is one zip_with/aggregate over the
    * embedding — no shuffle, no UDF, codegen throughout. Per-term
    * products round to 8 dp and accumulate as DECIMAL so the sum is
    * order-independent (engines agree bit-for-bit); the output scales
    * by 1/√outDim (the JL convention that preserves expected norms).
    */
  def randomProjection(df: DataFrame, idCol: String, embCol: String,
                       inDim: Int, outDim: Int): DataFrame = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(i: Int, j: Int): Double = {
      val h = md.digest(s"$i:$j".getBytes("UTF-8"))
      // first hex char < '8' ⇔ top nibble < 8 ⇔ top bit of byte 0 clear
      if ((h(0) & 0x80) == 0) 1.0 else -1.0
    }
    val cols = (0 until outDim).map { j =>
      val sArr = array((0 until inDim).map(i => lit(sign(i, j))): _*)
      val terms = zip_with(col(embCol).cast("array<double>"), sArr,
        (x, y) => round(x * y, 8).cast("decimal(20,8)"))
      val dotSum = aggregate(terms, lit(0).cast("decimal(28,8)"),
        (acc, v) => (acc + v).cast("decimal(28,8)"))
      round(dotSum.cast("double") / math.sqrt(outDim.toDouble), 4).as(s"p$j")
    }
    df.select(col(idCol) +: cols: _*)
  }

  /** Product quantization: split each vector into `m` contiguous
    * `subDim`-dim subvectors, assign each to its nearest codeword from
    * `centroids` (a small codebook table — here the caller's seed
    * vectors; production swaps in per-subspace k-means centroids, same
    * plan), and report the code per subspace plus the total
    * reconstruction error. PQ codes are the compressed representation
    * behind IVF-PQ ANN indexes: 64 floats → `m` small ints.
    *
    * Plan shape: explode to (vector, subspace), broadcast the
    * m·|codebook| codeword table, argmin = min(struct(d2, code)) — a
    * map-side-combinable aggregate, no window. Distances compose from
    * three codegen'd graft_dot calls (‖s‖² − 2·s·c + ‖c‖²) so engines
    * agree bit-for-bit; per-subspace minima round to 12 dp and sum as
    * DECIMAL (order-independent) before the final sqrt.
    */
  def productQuantize(df: DataFrame, centroids: DataFrame, idCol: String,
                      embCol: String, m: Int = 8,
                      subDim: Int = 8): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    def subs(src: DataFrame, name: String): DataFrame = src
      .withColumn("__emb", col(embCol).cast("array<double>"))
      .withColumn("__j", explode(array((0 until m).map(lit): _*)))
      .select(col(idCol), col("__j"),
        expr(s"slice(__emb, __j * $subDim + 1, $subDim)").as(name))
    // self-dots are constant per (vector, subspace) / per codeword row —
    // hoist them out of the joined projection so they compute once, not
    // once per codeword pairing (bit-identical d2: same operands, same
    // evaluation order)
    val sub = subs(df, "__sv")
      .withColumn("__ss", expr("graft_dot(__sv, __sv)"))
    val cent = subs(centroids, "__cv")
      .withColumnRenamed(idCol, "__cid")
      .withColumn("__cc", expr("graft_dot(__cv, __cv)"))
    val d2 = sub.join(broadcast(cent), Seq("__j"))
      .withColumn("__d2",
        expr("__ss - 2.0 * graft_dot(__sv, __cv) + __cc"))
    val best = d2.groupBy(col(idCol), col("__j"))
      .agg(min(struct(col("__d2"), col("__cid"))).as("__b"))
    val codeCols = (0 until m).map(j =>
      max(when(col("__j") === j, col("__b.__cid"))).as(s"code$j"))
    best.groupBy(col(idCol))
      .agg(codeCols.head, codeCols.tail :+
        round(sqrt(sum(round(col("__b.__d2"), 12).cast("decimal(28,14)"))
          .cast("double")), 6).as("recon_err"): _*)
  }

  /** Recommendation-list quality beyond accuracy — the serving-side
    * audit triple over a (list, item) table plus the item embeddings:
    * catalog coverage (share of the catalog any list surfaces),
    * novelty (mean −log₂ popularity-share of a recommended item — high
    * when lists escape the head), and intra-list similarity (mean
    * pairwise cosine within a list — the diversity dual).
    *
    * Scale shape: the rec table collapses once per metric family —
    * popularity is a hash agg on item (novelty is then a closed form
    * over the |items|-row table), ILS pairs are the within-list k²
    * self-join of the SMALL rec table (k per list, never the catalog),
    * with embeddings joined by item key. Every floating reduction snaps
    * to 12 dp and sums as DECIMAL (order-independent).
    */
  def recListMetrics(recs: DataFrame, listCol: String, itemCol: String,
                     items: DataFrame, itemIdCol: String, embCol: String,
                     roundTo: Int = 6): DataFrame = {
    val r = recs.select(col(listCol).as("__list"), col(itemCol).as("__item"))
      .localCheckpoint(true) // feeds popularity, coverage AND the pair join
    val catalog = items.agg(count(lit(1)).as("__cat"))
    val pop = r.groupBy(col("__item")).agg(count(lit(1)).as("__c"))
    val tot = pop.agg(sum(col("__c")).as("__tot"),
      count(lit(1)).as("__ni")) // pop rows ARE the distinct items
    val novelty = pop.crossJoin(broadcast(tot))
      .agg(first(col("__tot")).as("__nrec"), first(col("__ni")).as("__nd"),
        sum(round(col("__c") * -log2(col("__c").cast("double") /
            col("__tot")), 12).cast("decimal(38,12)")).as("__nv"))
    val n = normalized(items, itemIdCol, embCol)
    val pairs = r.alias("ra").join(r.alias("rb"),
        col("ra.__list") === col("rb.__list") &&
          col("ra.__item") < col("rb.__item"))
      .select(col("ra.__list").as("__list"), col("ra.__item").as("__ia"),
        col("rb.__item").as("__ib"))
      .join(n.select(col("id").as("__ia"), col("emb").as("__ea"),
        col("nrm").as("__na")), "__ia")
      .join(n.select(col("id").as("__ib"), col("emb").as("__eb"),
        col("nrm").as("__nb")), "__ib")
      .withColumn("__sim",
        expr("graft_dot(__ea, __eb)") / (col("__na") * col("__nb")))
    val ils = pairs.groupBy(col("__list"))
      .agg((sum(round(col("__sim"), 12).cast("decimal(38,12)"))
        .cast("double") / count(lit(1))).as("__lm"))
      .agg(count(lit(1)).as("__nl"),
        sum(round(col("__lm"), 12).cast("decimal(38,12)")).as("__ils"))
    novelty.crossJoin(broadcast(ils)).crossJoin(broadcast(catalog))
      .select(col("__nl").as("n_lists"), col("__nrec").as("n_recs"),
        round(col("__nd").cast("double") / col("__cat"), roundTo)
          .as("coverage"),
        round(col("__nv").cast("double") / col("__nrec"), roundTo)
          .as("novelty"),
        round(col("__ils").cast("double") / col("__nl"), roundTo)
          .as("ils"))
  }

  /** Per-dimension profile of an embedding column (mean / std / min /
    * max per coordinate) — the drift monitor for vector features: a
    * collapsed encoder dimension, a normalization regression, or a
    * quantization bias shows up here before any similarity metric
    * moves.
    *
    * One posexplode to (dim, value) rows — |rows|·d, the unavoidable
    * read — then ONE hash agg on dim (d output rows). Values quantize
    * to 6 dp so moment sums are exact decimals (order-independent);
    * mean/std are the usual one-division closed forms off exact sums.
    */
  def dimProfile(df: DataFrame, embCol: String,
                 roundTo: Int = 6): DataFrame = {
    val v = df
      .select(posexplode(expr(s"transform($embCol, x -> CAST(x AS DOUBLE))")))
      .toDF("dim", "__x")
      .select(col("dim"),
        round(col("__x"), 6).cast("decimal(18,6)").as("__v"))
    v.groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("__v")).as("__s"),
        sum(col("__v") * col("__v")).as("__q"),
        min(col("__v")).as("__mn"), max(col("__v")).as("__mx"))
      .select(col("dim").cast("long").as("dim"), col("n"),
        round(col("__s").cast("double") / col("n"), roundTo).as("mean"),
        when(col("n") > 1, round(sqrt(
          (col("__q").cast("double") - col("__s").cast("double") *
            col("__s").cast("double") / col("n")) / (col("n") - 1)),
          roundTo)).as("std"),
        col("__mn").cast("double").as("min_v"),
        col("__mx").cast("double").as("max_v"))
      .orderBy("dim")
  }

  /** (key, cent, cnrm) centroid-array table over a keyed signature
    * frame (the [[normalized]] shape + a grouping column): per-dim
    * means rounded to 6 dp — the rounding PINS the centroid
    * cross-engine, so every downstream dot against it is sequential
    * deterministic arithmetic. ≤ |keys| rows; always broadcast by
    * callers.
    */
  private def centroidArrays(n: DataFrame, keyCol: String): DataFrame =
    n.select(col(keyCol), posexplode(col("emb")).as(Seq("dim", "v")))
      .groupBy(col(keyCol), col("dim"))
      .agg(round(avg(col("v")), 6).as("c"))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("dim"), col("c"))))
        .as("__dc"))
      .withColumn("cent", expr("transform(__dc, x -> x.c)"))
      .withColumn("cnrm", sqrt(expr("graft_dot(cent, cent)")))
      .drop("__dc")

  /** SemDeDup (Abbas et al. 2023): semantic deduplication inside
    * coarse embedding clusters. Vectors are bucketed by the sign-bit
    * quantizer, each bucket gets a 6 dp-pinned centroid, and within a
    * bucket a vector is a DUPLICATE iff some other member is more
    * than `tau` cosine-similar AND sits strictly farther from the
    * centroid (ties on the centroid similarity break by smaller id) —
    * so of any duplicate clique exactly the farthest-from-centroid
    * member survives, the paper's keep-the-outlier rule (it preserves
    * the cluster's diversity better than keeping the medoid).
    *
    * Scale: the pair stage is an equi-join on the bucket id (Σ cell²,
    * never all-pairs — the q60 shape), centroids broadcast, and the
    * signature table localCheckpoints once for its three consumers.
    * Output: every vector with its bucket, centroid similarity, and
    * is_dup flag (drop `is_dup = 1` to apply the dedup).
    */
  def semDedup(df: DataFrame, idCol: String, embCol: String,
               tau: Double, signBits: Int = 4): DataFrame = {
    val n = normalized(df, idCol, embCol)
      .withColumn("bucket", signBucket(signBits))
    val cent = centroidArrays(n, "bucket")
    val j = n.join(broadcast(cent), Seq("bucket"))
      .withColumn("s2c",
        expr("graft_dot(emb, cent)") / (col("nrm") * col("cnrm")))
      .select(col("id"), col("bucket"), col("emb"), col("nrm"),
        col("s2c"))
      // LAZY localCheckpoint: both pair sides + the final projection.
      .localCheckpoint(false)
    val a = j.select(col("id").as("vec_id"), col("bucket"),
      col("emb").as("a_emb"), col("nrm").as("a_nrm"),
      col("s2c").as("a_s"))
    val b = j.select(col("id").as("__oid"), col("bucket"),
      col("emb").as("b_emb"), col("nrm").as("b_nrm"),
      col("s2c").as("b_s"))
    val dup = a.join(b, Seq("bucket"))
      .filter(col("vec_id") =!= col("__oid"))
      .filter(expr("graft_dot(a_emb, b_emb)") /
        (col("a_nrm") * col("b_nrm")) > tau)
      .filter(col("b_s") < col("a_s") ||
        (col("b_s") === col("a_s") && col("__oid") < col("vec_id")))
      .select(col("vec_id")).distinct()
      .withColumn("__d", lit(1L))
    j.join(dup, col("id") === col("vec_id"), "left")
      .select(col("id").as("vec_id"), col("bucket").cast("int").as("bucket"),
        MetricOps.normZero(round(col("s2c"), 6)).as("sim_centroid"),
        coalesce(col("__d"), lit(0L)).as("is_dup"))
  }

  /** Davies–Bouldin cluster-quality report over a labeled embedding
    * table (Davies & Bouldin 1979): per cluster i the scatter
    * Sᵢ = mean ‖x − cᵢ‖ (centroids 6 dp-pinned, distances sequential
    * deterministic), and Rᵢ = maxⱼ≠ᵢ (Sᵢ+Sⱼ)/‖cᵢ−cⱼ‖ — the worst
    * separation ratio; the DB index is the mean of the Rᵢ. Reading it
    * per label shows WHICH classes blur together (the embedding-audit
    * companion to [[labelAgreement]]).
    *
    * Scale: one posexplode hash-agg for the centroids (k·dims rows),
    * one broadcast join for the member distances, and the Rᵢ sweep is
    * a k² broadcast cross of the k-row centroid table — the corpus
    * never self-joins.
    */
  def daviesBouldin(df: DataFrame, idCol: String, embCol: String,
                    labelCol: String): DataFrame = {
    val n = normalized(df, idCol, embCol)
      .join(df.select(col(idCol).as("id"),
        col(labelCol).cast("long").as("lbl")), Seq("id"))
    val cent = centroidArrays(n, "lbl")
    val scat = n.join(broadcast(cent), Seq("lbl"))
      // fused codegen'd squared-L2 (bit-identical to the former
      // zip_with + graft_dot chain; A/B in BENCHLOG round 13)
      .withColumn("__d", sqrt(expr("graft_sqdist_d(emb, cent)")))
      .groupBy(col("lbl"))
      .agg(count(lit(1)).as("n_vecs"), round(avg(col("__d")), 6).as("s"))
    val ci = cent.select(col("lbl").as("li"), col("cent").as("ci"))
    val cj = cent.select(col("lbl").as("lj"), col("cent").as("cj"))
    val si = scat.select(col("lbl").as("li"), col("s").as("si"))
    val sj = scat.select(col("lbl").as("lj"), col("s").as("sj"))
    val r = ci.crossJoin(broadcast(cj)).filter(col("li") =!= col("lj"))
      .withColumn("__m", sqrt(expr("graft_sqdist_d(ci, cj)")))
      .join(broadcast(si), Seq("li")).join(broadcast(sj), Seq("lj"))
      .filter(col("__m") > 0)
      .groupBy(col("li"))
      .agg(round(max((col("si") + col("sj")) / col("__m")), 6)
        .as("r_max"))
    scat.join(r, col("lbl") === col("li"), "left")
      .select(col("lbl").as("label"), col("n_vecs"),
        col("s").as("scatter"), col("r_max"))
  }

  /** Simplified silhouette per label (Hruschka et al. 2004 — the
    * centroid form of Rousseeuw's silhouette): for every vector,
    * a = distance to its OWN label centroid, b = distance to the
    * nearest OTHER centroid, s = (b − a)/max(a, b) ∈ [−1, 1]; the
    * per-label mean says how cleanly that class separates. The full
    * silhouette is O(n²) pairwise; the centroid form is the standard
    * 100 TB substitute — map-only against a broadcast k-row centroid
    * table, and the quality ordering it induces matches in practice.
    *
    * Scale: centroids 6 dp-pinned ([[centroidArrays]]) and broadcast;
    * the per-vector sweep is one BroadcastNestedLoop over k rows (k =
    * |labels|), then one hash aggregation. s snaps to 12 dp pre-sum;
    * means round half-up at 6 dp sign-pinned. Degenerate guards:
    * max(a,b) = 0 (coincident vector and centroids) and single-label
    * corpora (no "other" centroid) both score s = 0.
    */
  def simplifiedSilhouette(df: DataFrame, idCol: String, embCol: String,
                           labelCol: String): DataFrame = {
    val n = normalized(df, idCol, embCol)
      .join(df.select(col(idCol).as("id"),
        col(labelCol).cast("long").as("lbl")), Seq("id"))
    val cent = centroidArrays(n, "lbl")
      .select(col("lbl").as("__cl"), col("cent"))
    val s = n.crossJoin(broadcast(cent))
      // fused codegen'd squared-L2 (bit-identical to the former
      // zip_with + graft_dot chain; A/B in BENCHLOG round 13)
      .withColumn("__d", sqrt(expr("graft_sqdist_d(emb, cent)")))
      .groupBy(col("id"), col("lbl"))
      .agg(min(when(col("lbl") === col("__cl"), col("__d"))).as("__a"),
        min(when(col("lbl") =!= col("__cl"), col("__d"))).as("__b"))
      .withColumn("__s", when(col("__b").isNull ||
          greatest(col("__a"), col("__b")) === 0, lit(0.0))
        .otherwise((col("__b") - col("__a")) /
          greatest(col("__a"), col("__b"))))
    s.groupBy(col("lbl"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(round(col("__s"), 12).cast("decimal(38,12)")).as("__ss"),
        min(col("__s")).as("__mn"), max(col("__s")).as("__mx"))
      .select(col("lbl").as("label"), col("n_vecs"),
        MetricOps.normZero(round(col("__ss").cast("double") /
          col("n_vecs"), 6)).as("mean_sil"),
        MetricOps.normZero(round(col("__mn"), 6)).as("min_sil"),
        MetricOps.normZero(round(col("__mx"), 6)).as("max_sil"))
  }

  /** k-NN-distance outlier score over the multi-probe ANN candidates:
    * for every vector, the cosine DISTANCE to its k-th nearest probed
    * neighbor (the classic k-dist of LOF/DBSCAN, here on the
    * deterministic sign-bucket candidate set). A vector is flagged
    * `is_outlier` when its k-dist exceeds `tau` OR its probed cells
    * hold fewer than k candidates at all — isolation in the coarse
    * quantizer is itself an outlier signal. The embedding-space
    * companion to the text quality gates: prototypical points score
    * near 0, mislabeled/garbage embeddings float away.
    *
    * Scale: candidates come from [[annTopKMultiProbe]] (equi-joins on
    * the probed cell id, Σ cell² pairs, never all-pairs; bounded top-k
    * via the TopKAggregator hash agg); one count/min aggregation and a
    * left join back to the id spine for zero-candidate vectors.
    */
  def knnDistOutlier(df: DataFrame, idCol: String, embCol: String,
                     k: Int = 5, tau: Double = 0.7,
                     signBits: Int = 4): DataFrame = {
    val kd = annTopKMultiProbe(df, idCol, embCol, k, signBits)
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_cand"),
        MetricOps.normZero(round(lit(1.0) - min(col("sim")), 6))
          .as("kth_dist"))
    df.select(col(idCol).as("vec_id")).join(kd, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        col("kth_dist"),
        (coalesce(col("n_cand"), lit(0L)) < k ||
          col("kth_dist") > tau).cast("long").as("is_outlier"))
  }

  /** Embedding isotropy audit per label: the EXACT mean pairwise
    * cosine of a group's unit vectors without any pair join, via the
    * centroid identity Σ_d(Σ_i u_id)² = n + Σ_{i≠j} uᵢ·uⱼ — so
    * mean_pairwise_cos = (‖Σu‖² − n)/(n(n−1)). Anisotropic embedding
    * spaces (mean cosine ≫ 0, Ethayarajh 2019) make every cosine
    * threshold in the dedup/ANN stack mean less than it reads;
    * this is the one-table audit that says whether 0.3 is "near" or
    * "everything". Reports n, mean vector norm, and the mean cosine.
    *
    * Scale: the identity turns an O(n²) pair statistic into one
    * posexplode + a (label, dim) hash aggregation — unit components
    * snap to 12 dp and sum as DECIMAL(38,12) (order-free exact sums),
    * the per-dim squares re-snap at 12 dp and sum over ≤dims rows.
    * No pair of vectors ever meets; no vector crosses the wire whole
    * after the explode.
    */
  def isotropyAudit(df: DataFrame, embCol: String,
                    labelCol: String): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    val base = df.select(col(labelCol).as("label"),
        expr(s"transform($embCol, x -> CAST(x AS DOUBLE))").as("__e"))
      .withColumn("__nrm", sqrt(dot("__e", "__e")))
      .filter(col("__nrm") > 0)
      // LAZY localCheckpoint: the norm stats and the dim sums both
      // read the normalized pass.
      .localCheckpoint(false)
    val stats = base.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(round(col("__nrm"), 12).cast("decimal(38,12)"))
          .as("__snrm"))
    val dims = base
      .select(col("label"),
        posexplode(expr("transform(__e, x -> x / __nrm)"))
          .as(Seq("__d", "__u")))
      .groupBy(col("label"), col("__d"))
      .agg(sum(round(col("__u"), 12).cast("decimal(38,12)"))
        .as("__sd"))
      .groupBy(col("label"))
      .agg(sum(round(col("__sd").cast("double") *
          col("__sd").cast("double"), 12).cast("decimal(38,12)"))
        .as("__ss"))
    stats.join(dims, Seq("label"))
      .select(col("label"), col("n_vecs"),
        round(col("__snrm").cast("double") / col("n_vecs"), 6)
          .as("mean_norm"),
        when(col("n_vecs") > 1, MetricOps.normZero(round(
          (col("__ss").cast("double") - col("n_vecs")) /
            (col("n_vecs").cast("double") * (col("n_vecs") - 1)), 6)))
          .as("mean_pairwise_cos"))
  }

  /** SemDeDup threshold sweep: for each candidate `tau` (given in
    * integer percent so the sweep key is never a float), how many
    * vectors the keep-the-farthest rule would drop. The pair stage
    * runs ONCE — per vector the maximum cosine to any bucket-mate
    * that would out-keep it ([[semDedup]]'s exact rule) — and every
    * threshold is then a row-local comparison, so sweeping 7 taus
    * costs one extra aggregation, not 7 pair joins. The knob table
    * read before committing a 100 TB semantic-dedup pass to a tau.
    */
  def semDedupSweep(df: DataFrame, idCol: String, embCol: String,
                    signBits: Int = 4,
                    tausPct: Seq[Int] =
                      Seq(20, 30, 40, 50, 60, 70, 80)): DataFrame = {
    val n = normalized(df, idCol, embCol)
      .withColumn("bucket", signBucket(signBits))
    val cent = centroidArrays(n, "bucket")
    val j = n.join(broadcast(cent), Seq("bucket"))
      .withColumn("s2c",
        expr("graft_dot(emb, cent)") / (col("nrm") * col("cnrm")))
      .select(col("id"), col("bucket"), col("emb"), col("nrm"),
        col("s2c"))
      // LAZY localCheckpoint: both pair sides and the vector total.
      .localCheckpoint(false)
    val a = j.select(col("id").as("vec_id"), col("bucket"),
      col("emb").as("a_emb"), col("nrm").as("a_nrm"),
      col("s2c").as("a_s"))
    val b = j.select(col("id").as("__oid"), col("bucket"),
      col("emb").as("b_emb"), col("nrm").as("b_nrm"),
      col("s2c").as("b_s"))
    val m = a.join(b, Seq("bucket"))
      .filter(col("vec_id") =!= col("__oid"))
      .filter(col("b_s") < col("a_s") ||
        (col("b_s") === col("a_s") && col("__oid") < col("vec_id")))
      .withColumn("__sim", expr("graft_dot(a_emb, b_emb)") /
        (col("a_nrm") * col("b_nrm")))
      .groupBy(col("vec_id")).agg(max(col("__sim")).as("__ms"))
    val tot = j.agg(count(lit(1)).as("__nv"))
    val taus = j.sparkSession.range(1)
      .select(explode(typedLit(tausPct.map(_.toLong))).as("tau_pct"))
    val counts = m
      .select(explode(typedLit(tausPct.map(_.toLong))).as("tau_pct"),
        col("__ms"))
      .groupBy(col("tau_pct"))
      .agg(sum((col("__ms") > col("tau_pct").cast("double") / 100)
        .cast("long")).as("__nd"))
    taus.join(counts, Seq("tau_pct"), "left")
      .crossJoin(broadcast(tot))
      .select(col("tau_pct"), col("__nv").as("n_vecs"),
        coalesce(col("__nd"), lit(0L)).as("n_dup"),
        (col("__nv") - coalesce(col("__nd"), lit(0L)))
          .as("n_survivors"),
        expr("CAST((coalesce(__nd, 0) * 2000000 + __nv) div " +
          "(2 * __nv) AS BIGINT)").as("dup_ppm"))
  }

  /** Embedding drift between two corpus snapshots, per label: counts on
    * each side, the cosine between the snapshots' per-label centroids,
    * and the centroid-norm delta (new − old). The re-embed audit: after
    * an encoder upgrade (or a crawl refresh) the per-label centroid
    * cosine is the first number that says whether downstream ANN
    * indexes and tau thresholds transfer or must be rebuilt.
    *
    * Scale: centroids via one dimension-level explode + hash agg per
    * side (never a pair join); components pin to 6 dp (the
    * [[semDedup]] / IVF centroid convention) so the cosine reproduces
    * across engines; the |labels|-row tables join broadcast-free at
    * negligible size. Labels present on only one side are dropped
    * (inner join) — there is no drift to report against nothing.
    */
  def embeddingDrift(dfOld: DataFrame, dfNew: DataFrame, idCol: String,
                     embCol: String, labelCol: String): DataFrame = {
    graft.plans.GraftExtensions.register(dfOld.sparkSession)
    def tag(d: DataFrame, t: Int) = d.select(lit(t).as("__snap"),
      col(labelCol).as("label"),
      expr(s"transform($embCol, x -> CAST(x AS DOUBLE))").as("__e"))
    val u = tag(dfOld, 0).unionByName(tag(dfNew, 1))
      // LAZY localCheckpoint: counts and centroids both read the
      // tagged union (each side's lineage would otherwise run twice).
      .localCheckpoint(false)
    val cnt = u.groupBy(col("__snap"), col("label"))
      .agg(count(lit(1)).as("__n"))
    val cent = u.select(col("__snap"), col("label"),
        posexplode(col("__e")).as(Seq("__dim", "__v")))
      .groupBy(col("__snap"), col("label"), col("__dim"))
      .agg(round(avg(col("__v")), 6).as("__c"))
      .groupBy(col("__snap"), col("label"))
      .agg(sort_array(collect_list(struct(col("__dim"), col("__c"))))
        .as("__s"))
      .select(col("__snap"), col("label"),
        expr("transform(__s, x -> x.__c)").as("__cent"))
    val j = cent.join(cnt, Seq("__snap", "label"))
      // 2×|labels| rows; both snapshot filters read it — without the
      // cut the explode+agg centroid lineage would run twice.
      .localCheckpoint(false)
    def snap(t: Int, c: String, n: String) = j.filter(col("__snap") === t)
      .select(col("label"), col("__cent").as(c), col("__n").as(n))
    snap(0, "__co", "n_old").join(snap(1, "__cn", "n_new"), Seq("label"))
      .withColumn("__no", sqrt(dot("__co", "__co")))
      .withColumn("__nn", sqrt(dot("__cn", "__cn")))
      .select(col("label").cast("long").as("label"), col("n_old"),
        col("n_new"),
        when(col("__no") === 0 || col("__nn") === 0, lit(null))
          .otherwise(MetricOps.normZero(round(
            dot("__co", "__cn") / (col("__no") * col("__nn")), 6)))
          .as("centroid_cos"),
        MetricOps.normZero(round(col("__nn") - col("__no"), 6))
          .as("norm_delta"))
  }

  /** Hubness audit: the in-degree histogram of the (multi-probe ANN)
    * directed kNN graph — for each in-degree, how many vectors are
    * "pointed at" that many times. High-dimensional embedding
    * pathologies concentrate in-degree on a few hub vectors (which
    * then dominate every retrieval list and poison kNN labels);
    * anti-hubs (in-degree 0) are unreachable by ANN retrieval
    * entirely. The histogram is the one-table diagnosis for both.
    *
    * Scale: rides the bucketed [[annTopKMultiProbe]] survivor table
    * (k·|vectors| rows — never the pair sweep), one count per
    * neighbor, a left join onto the column-pruned id spine to keep
    * the in-degree-0 row honest, and a ≤k·|vectors|-key histogram agg.
    */
  def hubnessAudit(df: DataFrame, idCol: String, embCol: String,
                   k: Int, signBits: Int = 4): DataFrame = {
    val deg = annTopKMultiProbe(df, idCol, embCol, k, signBits)
      .groupBy(col("neighbor_id").as("__id"))
      .agg(count(lit(1)).as("__deg"))
    df.select(col(idCol).as("__id"))
      .join(deg, Seq("__id"), "left")
      .select(coalesce(col("__deg"), lit(0L)).as("in_degree"))
      .groupBy(col("in_degree"))
      .agg(count(lit(1)).as("n_vecs"))
  }

  /** Cross-language near-duplicate mining: embedding near-dup pairs
    * grouped by the (unordered) language pair of the two documents.
    * Same-language rows are ordinary near-dups; CROSS-language rows
    * with high cosine are either translation pairs (bitext worth
    * harvesting for multilingual training) or template spam stamped
    * across locales — either way the rows a multilingual-corpus owner
    * triages first, and invisible to every text-shingle dedup.
    *
    * Scale: pairs come from the multi-probe sign-bucket equi-join
    * ([[embeddingNearDupBucketed]] — never an all-pairs sweep); the
    * language lookup is a co-keyed equi-join on the doc id; per-pair
    * sims snap to 12 dp and sum DECIMAL(38,12) so the group means
    * reproduce across engines and partitionings.
    */
  def crossLangNearDup(emb: DataFrame, idCol: String, embCol: String,
                       meta: DataFrame, metaIdCol: String,
                       langCol: String, threshold: Double,
                       signBits: Int = 4): DataFrame = {
    val pairs = embeddingNearDupBucketed(emb, idCol, embCol, threshold,
      signBits)
    val l = meta.select(col(metaIdCol), col(langCol))
    pairs
      .join(l.select(col(metaIdCol).as("id_a"), col(langCol).as("__la")),
        Seq("id_a"))
      .join(l.select(col(metaIdCol).as("id_b"), col(langCol).as("__lb")),
        Seq("id_b"))
      .select(least(col("__la"), col("__lb")).as("lang_lo"),
        greatest(col("__la"), col("__lb")).as("lang_hi"), col("sim"))
      .groupBy(col("lang_lo"), col("lang_hi"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(round(col("sim"), 12).cast("decimal(38,12)")).as("__ss"))
      .select(col("lang_lo"), col("lang_hi"),
        (col("lang_lo") =!= col("lang_hi")).cast("int").as("is_cross"),
        col("n_pairs"),
        round(col("__ss").cast("double") / col("n_pairs"), 6)
          .as("mean_sim"))
  }

  /** Signed-random-projection (SimHash-for-cosine) fidelity audit:
    * over the multi-probe bucket candidate pairs, compare the SRP
    * cosine ESTIMATE cos(π·h/w) — h = Hamming distance of the first
    * `w` sign bits under md5-seeded ±1 hyperplanes (the
    * [[randomProjection]] convention) — against the exact cosine.
    * Mean absolute error and signed bias per signature width: the
    * "how many bits does this embedding space actually need" tuning
    * table, the cosine-space twin of the MinHash fidelity audit.
    *
    * Determinism: projections accumulate 8-dp DECIMAL terms (sign is
    * then exact); h/w is a dyadic rational and cos(π·h/w) is looked
    * up from a LITERAL table computed once at plan build — both
    * engines read the same doubles, so no transcendental call ever
    * runs per-row. Error terms snap to 12 dp and sum DECIMAL(38,12).
    */
  def srpFidelity(df: DataFrame, idCol: String, embCol: String,
                  widths: Seq[Int] = Seq(4, 8, 16), inDim: Int = 64,
                  signBits: Int = 4): DataFrame = {
    require(widths.forall(w => w > 0 && (w & (w - 1)) == 0),
      "widths must be powers of two so h/w stays exact")
    val maxW = widths.max
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(i: Int, j: Int): Double = {
      val h = md.digest(s"$i:$j".getBytes("UTF-8"))
      if ((h(0) & 0x80) == 0) 1.0 else -1.0
    }
    // bits pack into ONE int mask per vector, so the per-pair Hamming
    // is a codegen'd bit_count(xor) — no array work ever runs on the
    // pair stream. The projection itself is RELATIONAL: posexplode the
    // vector once, broadcast-join the inDim×maxW sign table, and
    // hash-aggregate the 8-dp DECIMAL terms per (vector, plane) — a
    // giant literal sign matrix inlined per plane costs seconds of
    // codegen compilation per run, while this shape is three cheap
    // codegen'd operators (and the (id, plane) agg is exactly how the
    // signature pass distributes at 100 TB).
    val sess = df.sparkSession
    import sess.implicits._
    // sign table pivoted WIDE (one plane-array per dimension): the
    // per-(vector, dim) stream joins it broadcast and feeds ONE hash
    // agg computing all maxW plane sums at once — no (vector, plane)
    // row expansion, no second shuffle
    val signDf = broadcast((0 until inDim).map(i =>
      (i, (0 until maxW).map(j => if (sign(i, j) > 0) 1L else -1L)))
      .toDF("__i", "__ss"))
    // hash-spread the vectors BEFORE the dim explode: the maxW-plane
    // partial agg is the expensive step, and a single parquet input
    // split would otherwise run it on one thread
    val base = normalized(df, idCol, embCol).repartition(col("id"))
    // ONE exact 1e8-scaled long per (vector, dim), then pure long
    // multiply/sum across all maxW planes (was maxW DECIMAL(20,8)
    // round+multiply+sum per row — 16× the decimal work for identical
    // integers): signs are ±1 and round-HALF-UP is odd-symmetric, so
    // round(x·s, 8) = s·round(x, 8) exactly, and the scaled long sum
    // is > 0 iff the decimal sum is > 0 — bit-identical masks.
    val planeSums = (0 until maxW).map(j =>
      sum(col("__xl") * element_at(col("__ss"), j + 1)).as(s"__p$j"))
    val masks = base
      .select(col("id"), posexplode(col("emb")).as(Seq("__i", "__x")))
      .withColumn("__xl", (round(col("__x"), 8).cast("decimal(20,8)") *
        lit(100000000L)).cast("long"))
      .join(signDf, "__i")
      .groupBy(col("id"))
      .agg(planeSums.head, planeSums.tail: _*)
      .select(col("id"), (0 until maxW).map(j =>
        when(col(s"__p$j") > 0, lit(1 << j)).otherwise(lit(0)))
        .reduce(_ + _).cast("int").as("__mask"))
    val n = base.join(masks, Seq("id"))
      .withColumn("bucket", signBucket(signBits))
      // LAZY localCheckpoint: both sides of the candidate join read
      // the signature table (masks computed once, not once per side).
      .localCheckpoint(false)
    val probes = expr(
      s"array(bucket, ${(0 until signBits).map(j => s"CAST(bucket AS INT) ^ ${1 << j}").mkString(", ")})")
    val a = n.select(col("id").as("id_a"), col("emb").as("a_emb"),
      col("nrm").as("a_nrm"), col("__mask").as("__ma"),
      explode(probes).as("bucket"))
    val b = n.select(col("id").as("id_b"), col("emb").as("b_emb"),
      col("nrm").as("b_nrm"), col("__mask").as("__mb"), col("bucket"))
    // No distinct needed: only the a-side explodes probes, so a pair
    // (x, y) with Hamming-h buckets (h ≤ 1) matches on exactly ONE
    // probe cell — the candidate stream is duplicate-free by
    // construction and flows straight into the width explode without
    // a wide shuffle or materialization.
    val pairs = a.join(b, "bucket")
      // norm guards keep NaN sims (zero vectors) out of the DECIMAL
      // error terms
      .filter(col("id_a") < col("id_b") &&
        col("a_nrm") > 0 && col("b_nrm") > 0)
      .withColumn("sim", dot("a_emb", "b_emb") / (col("a_nrm") * col("b_nrm")))
      .withColumn("__x", expr("__ma ^ __mb"))
    val cosTable: Int => Column = w =>
      array((0 to w).map(h => lit(Math.cos(Math.PI * h / w))): _*)
    val est = widths.map(w => (w, cosTable(w))).foldLeft(lit(null).cast("double")) {
      case (acc, (w, tab)) =>
        when(col("w") === w, element_at(tab, col("__h") + 1)).otherwise(acc)
    }
    // per-width Hamming = bit_count of the masked xor — codegen'd
    // integer ops per pair, exploded as a tiny (w, h) struct
    val whArr = array(widths.map(w =>
      struct(lit(w).as("w"),
        expr(s"CAST(bit_count(__x & ${(1 << w) - 1}) AS INT)")
          .as("h"))): _*)
    pairs
      .select(col("sim"), explode(whArr).as("wh"))
      .select(col("sim"), col("wh.w").as("w"), col("wh.h").as("__h"))
      .withColumn("__est", est)
      .withColumn("__err", round(col("__est") - col("sim"), 12)
        .cast("decimal(38,12)"))
      .withColumn("__abs", round(abs(col("__est") - col("sim")), 12)
        .cast("decimal(38,12)"))
      .groupBy(col("w").cast("long").as("width"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("__abs")).as("__sa"),
        sum(col("__err")).as("__se"))
      .select(col("width"), col("n_pairs"),
        round(col("__sa").cast("double") / col("n_pairs"), 6).as("mae"),
        MetricOps.normZero(
          round(col("__se").cast("double") / col("n_pairs"), 6))
          .as("bias"))
  }

  /** Matryoshka (prefix-dimension) fidelity audit: over the
    * multi-probe bucket candidate pairs, compare the cosine computed
    * from only the FIRST `d` dimensions against the full-width cosine,
    * for each d in `dims` — MAE and signed bias per truncation budget.
    * The decision table for Matryoshka-style dimension truncation
    * (Kusupati et al. 2022): if cosine at d=16 tracks d=64, the index,
    * the pair joins, and the network all shrink 4×. (For embeddings
    * NOT trained with MRL the early dims carry no special structure —
    * a large bias here is exactly the evidence that truncation is
    * unsafe, which is the point of measuring.)
    *
    * Scale: prefix norms compute once per VECTOR (before the join);
    * the pair stage is the standard sign-bucket probe equi-join plus
    * `|dims|` codegen'd prefix dots per pair; error terms snap to
    * 12 dp and sum DECIMAL(38,12). `dims` must be ascending so the
    * smallest prefix norm guards all of them.
    */
  def matryoshkaFidelity(df: DataFrame, idCol: String, embCol: String,
                         dims: Seq[Int] = Seq(8, 16, 32),
                         signBits: Int = 4): DataFrame = {
    require(dims == dims.sorted && dims.nonEmpty, "dims ascending")
    val n = dims.foldLeft(
        normalized(df, idCol, embCol).withColumn("bucket",
          signBucket(signBits))) { (acc, d) =>
        acc.withColumn(s"__n$d",
          sqrt(expr(s"graft_dot_range(emb, emb, 1, $d)")))
      }
      // LAZY localCheckpoint: both sides of the candidate join read
      // the (emb, norms, bucket) signature table.
      .localCheckpoint(false)
    val probes = expr(
      s"array(bucket, ${(0 until signBits).map(j => s"CAST(bucket AS INT) ^ ${1 << j}").mkString(", ")})")
    def side(tag: String, probe: Boolean) = {
      val cols = Seq(col("id").as(s"id_$tag"), col("emb").as(s"${tag}_emb"),
        col("nrm").as(s"${tag}_nrm")) ++
        dims.map(d => col(s"__n$d").as(s"__n${d}_$tag")) :+
        (if (probe) explode(probes).as("bucket") else col("bucket"))
      n.select(cols: _*)
    }
    val minD = dims.head
    val pairs = side("a", probe = true)
      .join(side("b", probe = false), "bucket")
      .filter(col("id_a") < col("id_b") &&
        col(s"__n${minD}_a") > 0 && col(s"__n${minD}_b") > 0)
      .withColumn("sim",
        dot("a_emb", "b_emb") / (col("a_nrm") * col("b_nrm")))
    // graft_dot_range: the zero-allocation prefix dot (bit-identical
    // to the sliced form and the oracle's list_dot_product on slices)
    val dimArr = array(dims.map(d =>
      struct(lit(d).as("d"),
        (expr(s"graft_dot_range(a_emb, b_emb, 1, $d)") /
          (col(s"__n${d}_a") * col(s"__n${d}_b"))).as("s"))): _*)
    pairs.select(col("sim"), explode(dimArr).as("ds"))
      .select(col("sim"), col("ds.d").as("d"), col("ds.s").as("__sd"))
      // Embeddings shorter than a requested dim d yield a null prefix
      // dot (graft_dot_range window-exceeds contract). Drop the row —
      // otherwise the DECIMAL error sums skip it but count(1) still
      // counts it, silently deflating mae/bias. Mirrors quantFidelity.
      .filter(col("__sd").isNotNull)
      .withColumn("__err", round(col("__sd") - col("sim"), 12)
        .cast("decimal(38,12)"))
      .withColumn("__abs", round(abs(col("__sd") - col("sim")), 12)
        .cast("decimal(38,12)"))
      .groupBy(col("d").cast("long").as("dim"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("__abs")).as("__sa"),
        sum(col("__err")).as("__se"))
      .select(col("dim"), col("n_pairs"),
        round(col("__sa").cast("double") / col("n_pairs"), 6).as("mae"),
        MetricOps.normZero(
          round(col("__se").cast("double") / col("n_pairs"), 6))
          .as("bias"))
  }

  /** Scalar-quantization similarity fidelity: over the multi-probe
    * bucket candidate pairs, the cosine computed from int-quantized
    * reconstructions (per-vector min/max scale, the q91 embedding-
    * store convention) vs the full-precision cosine, per quantization
    * level (15 = int4, 255 = int8). The compression decision table in
    * SIMILARITY space — per-component reconstruction error (q91's
    * max_err) says little about what retrieval actually loses.
    *
    * Scale: reconstructed arrays build once per VECTOR (row-local
    * HOFs before the join); the pair stage adds one codegen'd dot per
    * level; error terms snap to 12 dp and sum DECIMAL(38,12).
    */
  def quantFidelity(df: DataFrame, idCol: String, embCol: String,
                    levels: Seq[Int] = Seq(15, 255),
                    signBits: Int = 4): DataFrame = {
    val n0 = normalized(df, idCol, embCol)
      .withColumn("__mn", array_min(col("emb")))
      .withColumn("__mx", array_max(col("emb")))
    val n = levels.foldLeft(n0) { (acc, l) =>
        acc.withColumn(s"__r$l", expr(
          s"""transform(emb, x -> CAST(round((x - __mn) /
             |  (CASE WHEN __mx = __mn THEN CAST(1.0 AS DOUBLE)
             |        ELSE (__mx - __mn) / CAST($l.0 AS DOUBLE) END))
             |  AS INT)
             |  * (CASE WHEN __mx = __mn THEN CAST(1.0 AS DOUBLE)
             |     ELSE (__mx - __mn) / CAST($l.0 AS DOUBLE) END)
             |  + __mn)""".stripMargin))
          .withColumn(s"__q$l", sqrt(expr(s"graft_dot(__r$l, __r$l)")))
      }
      .withColumn("bucket", signBucket(signBits))
      // LAZY localCheckpoint: reconstructions build once, both join
      // sides read them.
      .localCheckpoint(false)
    val probes = expr(
      s"array(bucket, ${(0 until signBits).map(j => s"CAST(bucket AS INT) ^ ${1 << j}").mkString(", ")})")
    def side(tag: String, probe: Boolean) = {
      val cols = Seq(col("id").as(s"id_$tag"), col("emb").as(s"${tag}_emb"),
        col("nrm").as(s"${tag}_nrm")) ++
        levels.flatMap(l => Seq(col(s"__r$l").as(s"__r${l}_$tag"),
          col(s"__q$l").as(s"__q${l}_$tag"))) :+
        (if (probe) explode(probes).as("bucket") else col("bucket"))
      n.select(cols: _*)
    }
    val pairs = side("a", probe = true)
      .join(side("b", probe = false), "bucket")
      .filter(col("id_a") < col("id_b") &&
        col("a_nrm") > 0 && col("b_nrm") > 0)
      .withColumn("sim",
        dot("a_emb", "b_emb") / (col("a_nrm") * col("b_nrm")))
    val lvlArr = array(levels.map(l =>
      struct(lit(l).as("l"),
        when(col(s"__q${l}_a") > 0 && col(s"__q${l}_b") > 0,
          expr(s"graft_dot(__r${l}_a, __r${l}_b)") /
            (col(s"__q${l}_a") * col(s"__q${l}_b"))).as("s"))): _*)
    pairs.select(col("sim"), explode(lvlArr).as("ls"))
      .filter(col("ls.s").isNotNull)
      .select(col("sim"), col("ls.l").as("l"), col("ls.s").as("__sq"))
      .withColumn("__err", round(col("__sq") - col("sim"), 12)
        .cast("decimal(38,12)"))
      .withColumn("__abs", round(abs(col("__sq") - col("sim")), 12)
        .cast("decimal(38,12)"))
      .groupBy(col("l").cast("long").as("level"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("__abs")).as("__sa"),
        sum(col("__err")).as("__se"))
      .select(col("level"), col("n_pairs"),
        round(col("__sa").cast("double") / col("n_pairs"), 6).as("mae"),
        MetricOps.normZero(
          round(col("__se").cast("double") / col("n_pairs"), 6))
          .as("bias"))
  }

  /** MMR diversified rerank (Carbonell & Goldstein 1998): from each
    * query's multi-probe ANN top-`m` candidates, greedily select `k`
    * results maximizing `sim − λ·max(sim to already-selected)` — the
    * standard redundancy-vs-relevance rerank that keeps three copies
    * of the same page out of one result list. The greedy rounds are
    * UNROLLED (k is a small constant), each one an argmax struct-max
    * per query — no window, no per-query loop.
    *
    * Scale: candidates ride [[annTopKMultiProbe]] (k·|vectors| rows);
    * the candidate-candidate sim matrix is bounded by m² per list
    * (the q218 ILS shape, never the catalog); every argmax is a
    * map-side-combinable aggregate with ties pinned to the smaller
    * id. Sims enter at 6 dp (the selectTopK contract) so the MMR
    * scores are engine-portable doubles.
    */
  def mmrRerank(df: DataFrame, idCol: String, embCol: String,
                m: Int = 5, k: Int = 3,
                signBits: Int = 4): DataFrame = {
    require(k >= 1 && k <= 3, "unrolled for k <= 3")
    // λ is fixed at 1/2 so the MMR score works in EXACT integer
    // half-ppm units: score_u = 2·sim_ppm − ps_ppm. Rounding the
    // double form sim₆ − ½·ps₆ lands exactly on half-boundaries
    // (6-dp inputs, 7-dp result) where engines legally disagree —
    // the divide-then-round class, designed out as integers.
    val cand = annTopKMultiProbe(df, idCol, embCol, m, signBits)
      .withColumn("__sp", expr("CAST(round(sim * 1000000) AS BIGINT)"))
      // the pair-sim build and every greedy round read the lists.
      .localCheckpoint(false)
    val n = normalized(df, idCol, embCol)
    val ps = cand.select(col("vec_id"), col("neighbor_id").as("__ca"))
      .join(cand.select(col("vec_id"), col("neighbor_id").as("__cb")),
        Seq("vec_id"))
      .filter(col("__ca") =!= col("__cb"))
      .join(n.select(col("id").as("__ca"), col("emb").as("a_emb"),
        col("nrm").as("a_nrm")), Seq("__ca"))
      .join(n.select(col("id").as("__cb"), col("emb").as("b_emb"),
        col("nrm").as("b_nrm")), Seq("__cb"))
      .filter(col("a_nrm") > 0 && col("b_nrm") > 0)
      .select(col("vec_id"), col("__ca"), col("__cb"),
        expr("CAST(round(graft_dot(a_emb, b_emb) / (a_nrm * b_nrm) " +
          "* 1000000) AS BIGINT)").as("__pp"))
      .localCheckpoint(false)
    def argmax(d: DataFrame, score: Column): DataFrame = d
      .groupBy(col("vec_id"))
      .agg(max(struct(score.as("__sc"),
        (-col("neighbor_id")).as("__neg"))).as("__m"))
      .select(col("vec_id"), (-col("__m.__neg")).as("__sel"),
        col("__m.__sc").as("__score"))
    def emit(s: DataFrame, rank: Int): DataFrame =
      s.select(col("vec_id"), lit(rank.toLong).as("rank"),
        col("__sel").as("selected"),
        (col("__score").cast("double") / lit(2000000.0)).as("score"))
    val s1 = argmax(cand, col("__sp") * 2)
    if (k == 1) return emit(s1, 1)
    def simTo(selDf: DataFrame, as: String) =
      ps.join(selDf.select(col("vec_id"), col("__sel").as("__cb")),
        Seq("vec_id", "__cb"))
        .select(col("vec_id"), col("__ca").as("neighbor_id"),
          col("__pp").as(as))
    val c2 = cand.join(s1.select(col("vec_id"), col("__sel")),
        Seq("vec_id"))
      .filter(col("neighbor_id") =!= col("__sel"))
      .join(simTo(s1, "__p1"), Seq("vec_id", "neighbor_id"))
      .withColumn("__u", col("__sp") * 2 - col("__p1"))
    val s2 = argmax(c2, col("__u"))
    if (k == 2) return emit(s1, 1).unionAll(emit(s2, 2))
    val c3 = cand.join(s1.select(col("vec_id"),
        col("__sel").as("__s1")), Seq("vec_id"))
      .join(s2.select(col("vec_id"), col("__sel").as("__s2")),
        Seq("vec_id"))
      .filter(col("neighbor_id") =!= col("__s1") &&
        col("neighbor_id") =!= col("__s2"))
      .join(simTo(s1, "__p1"), Seq("vec_id", "neighbor_id"))
      .join(simTo(s2, "__p2"), Seq("vec_id", "neighbor_id"))
      .withColumn("__u",
        col("__sp") * 2 - greatest(col("__p1"), col("__p2")))
    val s3 = argmax(c3, col("__u"))
    emit(s1, 1).unionAll(emit(s2, 2)).unionAll(emit(s3, 3))
  }

  /** Confident-learning noise matrix (the Cleanlab joint, Northcutt
    * et al. 2021, estimated with kNN consensus instead of a trained
    * model): each vector's PREDICTED label is the majority label of
    * its multi-probe ANN top-k neighbors (ties broken toward the
    * smaller label id); the output is the (given, predicted) joint
    * census with the within-given-class rate. Off-diagonal mass is
    * the label-noise estimate per class pair — the table that decides
    * which (class, class) confusions to send for relabeling, one
    * level above [[labelAgreement]]'s per-row screen.
    *
    * Scale: neighbors from the sign-bucket probe equi-join (never
    * all-pairs); the majority vote is a (vector, label) hash agg +
    * one argmax struct-max; the joint is a |labels|²-bounded agg with
    * class totals joined back broadcast.
    */
  def noiseMatrix(df: DataFrame, idCol: String, embCol: String,
                  labelCol: String, k: Int,
                  signBits: Int = 4): DataFrame = {
    val nn = annTopKMultiProbe(df, idCol, embCol, k, signBits)
    val lab = df.select(col(idCol), col(labelCol))
    val votes = nn
      .join(lab.select(col(idCol).as("neighbor_id"),
        col(labelCol).as("__nl")), Seq("neighbor_id"))
      .groupBy(col("vec_id"), col("__nl"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("__c"), (-col("__nl")).as("__neg"))).as("__m"))
      .select(col("vec_id"), (-col("__m.__neg")).as("__pred"))
    val joint = votes
      .join(lab.select(col(idCol).as("vec_id"),
        col(labelCol).as("__given")), Seq("vec_id"))
      .groupBy(col("__given").cast("long").as("given_label"),
        col("__pred").cast("long").as("predicted_label"))
      .agg(count(lit(1)).as("n_vectors"))
      .localCheckpoint(false)
    val totals = joint.groupBy(col("given_label"))
      .agg(sum(col("n_vectors")).as("__t"))
    joint.join(broadcast(totals), Seq("given_label"))
      .select(col("given_label"), col("predicted_label"),
        col("n_vectors"),
        expr("CAST((n_vectors * 2000000 + __t) div (2 * __t) " +
          "AS BIGINT)").as("class_share_ppm"))
  }

  /** Multi-vector late-interaction retrieval (the ColBERT MaxSim
    * rule, Khattab & Zaharia 2020): documents are GROUPS of vectors
    * (here `groupSize` consecutive ids — production supplies real
    * per-token vectors, same plan); a query group scores a candidate
    * group by Σ over query vectors of the MAX cosine against the
    * candidate's vectors, and the top-k candidate groups win. MaxSim
    * keeps per-token granularity that single-vector cosine pools
    * away — the standard quality jump for retrieval — and this
    * operator shows it runs on the SAME sign-bucket probe
    * infrastructure as every other ANN here.
    *
    * Scale: vector-level candidates from the multi-probe equi-join
    * (missing cross-bucket vector pairs lower a group score exactly
    * like IVF probing misses neighbors — the same recall dial); the
    * MAX per (query group, candidate group, query vector) and the
    * Σ per pair are two hash aggs on the bounded candidate stream;
    * per-vector maxima snap to 12 dp and sum DECIMAL(38,12); the
    * top-k is the TopKAggregator, never a window.
    */
  def maxsimRetrieval(df: DataFrame, idCol: String, embCol: String,
                      groupSize: Int = 4, k: Int = 3,
                      signBits: Int = 4,
                      queryMod: Int = 10): DataFrame = {
    val n = normalized(df, idCol, embCol)
      .withColumn("bucket", signBucket(signBits))
      .withColumn("__g", expr(s"id div $groupSize"))
      // LAZY localCheckpoint: the query side and the index side both
      // read the signature table.
      .localCheckpoint(false)
    val probes = expr(
      s"array(bucket, ${(0 until signBits).map(j => s"CAST(bucket AS INT) ^ ${1 << j}").mkString(", ")})")
    val q = n.filter(pmod(col("__g"), lit(queryMod)) === 0)
      .select(col("id").as("__qv"), col("__g").as("qgroup"),
        col("emb").as("a_emb"), col("nrm").as("a_nrm"),
        explode(probes).as("bucket"))
    val c = n.select(col("id").as("__cv"), col("__g").as("cgroup"),
      col("emb").as("b_emb"), col("nrm").as("b_nrm"), col("bucket"))
    q.join(c, "bucket")
      .filter(col("qgroup") =!= col("cgroup") &&
        col("a_nrm") > 0 && col("b_nrm") > 0)
      .withColumn("sim",
        dot("a_emb", "b_emb") / (col("a_nrm") * col("b_nrm")))
      .groupBy(col("qgroup"), col("cgroup"), col("__qv"))
      .agg(max(col("sim")).as("__mx"))
      .groupBy(col("qgroup"), col("cgroup"))
      .agg(sum(round(col("__mx"), 12).cast("decimal(38,12)"))
        .as("__score"))
      .select(col("qgroup").as("vec_id"),
        col("cgroup").as("neighbor_id"),
        col("__score").cast("double").as("sim"))
      .transform(selectTopK(_, k))
      .select(col("vec_id").as("qgroup"),
        col("neighbor_id").as("cgroup"), col("sim").as("score"))
  }

  /** Quantized-index ranking agreement: within the multi-probe bucket
    * candidates, the top-k lists ranked by int-quantized cosine
    * (per-vector min/max reconstruction, the q91 convention) vs the
    * full-precision top-k — overlap per quantization level. The
    * RANKING twin of [[quantFidelity]]: pairwise error says how far
    * sims move; this says whether the index still returns the same
    * neighbors, which is what retrieval actually pays for.
    *
    * Scale: ONE candidate pass computes the exact and per-level
    * reconstructed sims; each ranking is a TopKAggregator hash agg
    * (map-side partials, no window); the agreement join runs on the
    * k·|vectors| survivor tables only.
    */
  def quantRecall(df: DataFrame, idCol: String, embCol: String, k: Int,
                  levels: Seq[Int] = Seq(15, 255),
                  signBits: Int = 4): DataFrame = {
    val n0 = normalized(df, idCol, embCol)
      .withColumn("__mn", array_min(col("emb")))
      .withColumn("__mx", array_max(col("emb")))
    val n = levels.foldLeft(n0) { (acc, l) =>
        acc.withColumn(s"__r$l", expr(
          s"""transform(emb, x -> CAST(round((x - __mn) /
             |  (CASE WHEN __mx = __mn THEN CAST(1.0 AS DOUBLE)
             |        ELSE (__mx - __mn) / CAST($l.0 AS DOUBLE) END))
             |  AS INT)
             |  * (CASE WHEN __mx = __mn THEN CAST(1.0 AS DOUBLE)
             |     ELSE (__mx - __mn) / CAST($l.0 AS DOUBLE) END)
             |  + __mn)""".stripMargin))
          .withColumn(s"__q$l", sqrt(expr(s"graft_dot(__r$l, __r$l)")))
      }
      .withColumn("bucket", signBucket(signBits))
      // LAZY localCheckpoint: both join sides read the signature table.
      .localCheckpoint(false)
    val probes = expr(
      s"array(bucket, ${(0 until signBits).map(j => s"CAST(bucket AS INT) ^ ${1 << j}").mkString(", ")})")
    def side(tag: String, probe: Boolean) = {
      val cols = Seq(col("id").as(s"id_$tag"), col("emb").as(s"${tag}_emb"),
        col("nrm").as(s"${tag}_nrm")) ++
        levels.flatMap(l => Seq(col(s"__r$l").as(s"__r${l}_$tag"),
          col(s"__q$l").as(s"__q${l}_$tag"))) :+
        (if (probe) explode(probes).as("bucket") else col("bucket"))
      n.select(cols: _*)
    }
    val simCols = levels.map(l =>
      when(col(s"__q${l}_a") > 0 && col(s"__q${l}_b") > 0,
        expr(s"graft_dot(__r${l}_a, __r${l}_b)") /
          (col(s"__q${l}_a") * col(s"__q${l}_b"))).as(s"__s$l"))
    val cand = side("a", probe = true)
      .join(side("b", probe = false), "bucket")
      .filter(col("id_a") =!= col("id_b") &&
        col("a_nrm") > 0 && col("b_nrm") > 0)
      .select(Seq(col("id_a").as("vec_id"),
        col("id_b").as("neighbor_id"),
        (dot("a_emb", "b_emb") / (col("a_nrm") * col("b_nrm")))
          .as("sim")) ++ simCols: _*)
      // the exact ranking and each level's ranking read the candidates.
      .localCheckpoint(false)
    val ft = selectTopK(
        cand.select(col("vec_id"), col("neighbor_id"), col("sim")), k)
      .select(col("vec_id"), col("neighbor_id"))
      .localCheckpoint(false)
    val nTop = ft.agg(count(lit(1)).as("__nt"))
    levels.map { l =>
      val tl = selectTopK(cand.filter(col(s"__s$l").isNotNull)
        .select(col("vec_id"), col("neighbor_id"),
          col(s"__s$l").as("sim")), k)
      tl.join(ft, Seq("vec_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
        .withColumn("level", lit(l.toLong))
    }.reduce(_ unionAll _)
      .crossJoin(broadcast(nTop))
      .select(col("level"), col("__nt").as("n_top"), col("n_hits"),
        when(col("__nt") > 0, expr(
          "CAST((n_hits * 2000000 + __nt) div (2 * __nt) AS BIGINT)"))
          .as("agree_ppm"))
  }

  /** Measured ANN recall audit: for a deterministic sample of query
    * vectors (id mod `sampleMod` = 0), the fraction of the EXACT
    * cosine top-k recovered by the sign-bucket index at each probe
    * level (Hamming ≤ 0 / 1 / 2) — the recall/cost dial measured on
    * THIS corpus as a declared query, not a one-off notebook number.
    * Reading the table picks the probe level (or says the quantizer
    * needs more bits) before anyone ships an index.
    *
    * Scale: the exact side is a DELIBERATE sampled brute-force
    * baseline — |queries| = n/sampleMod rows cross the full index
    * exactly once (the documented exact-kNN cartesian class, sampled
    * so its cost is n²/sampleMod); the ANN side is the standard probe
    * equi-join computed ONCE at Hamming ≤ 2 with each candidate
    * tagged by its minimum probe distance, so the three levels are
    * filters over one candidate table, not three joins.
    */
  /** [[annRecallAudit]] under the [[annTopKAdaptive]] width schedule:
    * the recall the adaptive dial actually pays at the corpus's own
    * width, per probe level — q436's measured safety certificate (the
    * fixed-width audit is q397).
    */
  def annRecallAuditAdaptive(df: DataFrame, idCol: String,
                             embCol: String, k: Int,
                             sampleMod: Int = 20): DataFrame =
    annRecallAudit(df, idCol, embCol, k, adaptiveSignBits(df), sampleMod)

  def annRecallAudit(df: DataFrame, idCol: String, embCol: String,
                     k: Int, signBits: Int = 4,
                     sampleMod: Int = 20): DataFrame = {
    val n = normalized(df, idCol, embCol)
      .withColumn("bucket", signBucket(signBits))
      // LAZY localCheckpoint: the query filter, the exact baseline and
      // the probe join all read the signature table.
      .localCheckpoint(false)
    annRecallCore(n, signBits, k, sampleMod)
  }

  /** Packed SRP sign-mask per vector: `planes` md5-seeded random
    * hyperplanes (the q396 `srpFidelity` signature stage — same sign
    * convention, same 8-dp DECIMAL plane sums — exposed as a BUCKET
    * table for ANN). SRP planes mix ALL dimensions, so at equal width
    * they quantize cosine far better than the leading-dim signs of
    * [[signBucket]] — the q438→q439 recall gap measures exactly that.
    */
  private def srpMaskTable(df: DataFrame, idCol: String, embCol: String,
                           planes: Int, inDim: Int = 64): DataFrame = {
    val sess = df.sparkSession
    import sess.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(i: Int, j: Int): Double = {
      val h = md.digest(s"$i:$j".getBytes("UTF-8"))
      if ((h(0) & 0x80) == 0) 1.0 else -1.0
    }
    val signDf = broadcast((0 until inDim).map(i =>
      (i, (0 until planes).map(j => sign(i, j)))).toDF("__i", "__ss"))
    val planeSums = (0 until planes).map(j =>
      sum(round(col("__x") * element_at(col("__ss"), j + 1), 8)
        .cast("decimal(20,8)")).as(s"__p$j"))
    df.select(col(idCol).as("id"),
        expr(s"transform($embCol, x -> CAST(x AS DOUBLE))").as("__e"))
      // NOT for determinism (DECIMAL plane sums are exact and
      // order-independent): hash-spread the vectors BEFORE the 64-way
      // dim explode + broadcast join + partial agg — the expensive
      // stage — so a single small parquet input split doesn't run it
      // on one thread. Pre-explode rows are 64× cheaper to shuffle
      // than post-explode; the later groupBy only moves partials.
      .repartition(col("id"))
      .select(col("id"), posexplode(col("__e")).as(Seq("__i", "__x")))
      .join(signDf, "__i")
      .groupBy(col("id"))
      .agg(planeSums.head, planeSums.tail: _*)
      .select(col("id"), (0 until planes).map(j =>
        when(col(s"__p$j") > 0, lit(1 << j)).otherwise(lit(0)))
        .reduce(_ + _).cast("int").as("bucket"))
  }

  /** [[annRecallAudit]] with SRP hyperplane buckets at the
    * [[annTopKAdaptive]] width schedule — the quantizer upgrade the
    * q438 measurement motivates: same audit, same probe levels, same
    * sampled exact baseline, buckets from [[srpMaskTable]] instead of
    * leading-dim signs.
    */
  def annRecallAuditSrpAdaptive(df: DataFrame, idCol: String,
                                embCol: String, k: Int,
                                sampleMod: Int = 20): DataFrame = {
    val bits = adaptiveSignBits(df)
    val n = normalized(df, idCol, embCol)
      .join(srpMaskTable(df, idCol, embCol, bits), "id")
      .localCheckpoint(false)
    annRecallCore(n, bits, k, sampleMod)
  }

  /** Shared recall-audit core over any (id, emb, nrm, bucket)
    * signature table: exact top-k on a 1-in-`sampleMod` query sample
    * vs the multi-probe candidates at Hamming levels 0/1/2.
    */
  /** Multi-probe (Hamming ≤ 2) candidate-pair table over a sign-bucket
    * signature table: one row per DISTINCT reachable (query, neighbor)
    * pair, tagged with its minimum probe distance `hd` and cosine.
    * localCheckpointed — the per-level recall filters AND q450's
    * per-level candidate counts all read it.
    */
  private def signProbeCands(q: DataFrame, n: DataFrame,
                             signBits: Int): DataFrame = {
    val h1 = (0 until signBits).map(j =>
      s"struct(CAST(bucket AS INT) ^ ${1 << j} AS pb, 1 AS hd)")
    val h2 = for {
      i <- 0 until signBits; j <- i + 1 until signBits
    } yield s"struct(CAST(bucket AS INT) ^ ${(1 << i) | (1 << j)} AS pb, 2 AS hd)"
    val probes = expr((Seq("struct(CAST(bucket AS INT) AS pb, 0 AS hd)")
      ++ h1 ++ h2).mkString("array(", ", ", ")"))
    val a = q.select(col("id").as("vec_id"), col("emb").as("a_emb"),
        col("nrm").as("a_nrm"), explode(probes).as("p"))
      .select(col("vec_id"), col("a_emb"), col("a_nrm"),
        col("p.pb").as("bucket"), col("p.hd").as("hd"))
    val b = n.select(col("id").as("neighbor_id"), col("emb").as("b_emb"),
      col("nrm").as("b_nrm"), col("bucket").cast("int").as("bucket"))
    a.join(b, "bucket")
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("sim", dot("a_emb", "b_emb") / (col("a_nrm") * col("b_nrm")))
      .groupBy(col("vec_id"), col("neighbor_id"))
      .agg(min(col("hd")).as("hd"), max(col("sim")).as("sim"))
      .localCheckpoint(false)
  }

  private def annRecallCore(n: DataFrame, signBits: Int, k: Int,
                            sampleMod: Int): DataFrame = {
    val q = n.filter(pmod(col("id"), lit(sampleMod)) === 0)
    val exact = selectTopK(pairSim(q, n), k)
      .select(col("vec_id"), col("neighbor_id"), lit(1L).as("__e"))
    // three level filters read the shared candidate table.
    val cand = signProbeCands(q, n, signBits)
    val ann = Seq(0, 1, 2).map { lvl =>
      selectTopK(cand.filter(col("hd") <= lvl)
          .select(col("vec_id"), col("neighbor_id"), col("sim")), k)
        .withColumn("level", lit(lvl.toLong))
    }.reduce(_ unionAll _)
    val nq = q.agg(count(lit(1)).as("__nq"))
    ann.join(exact, Seq("vec_id", "neighbor_id"), "left")
      .groupBy(col("level"))
      .agg(count(col("__e")).as("n_hits"))
      .crossJoin(broadcast(nq))
      .select(col("level"), col("__nq").as("n_queries"), col("n_hits"),
        expr(s"CAST((n_hits * 2000000 + $k * __nq) " +
          s"div (2 * $k * __nq) AS BIGINT)").as("recall_ppm"))
  }

  // ------------------------------------------------------------- IVF
  // Trained coarse quantizer: the data-DEPENDENT counterpart of the
  // sign-bucket family. Sign buckets are free but geometry-blind; a
  // k-means codebook adapts cells to the corpus density (the classic
  // IVF index build). Everything below is exact INTEGER arithmetic on
  // ppm-quantized embeddings, so the trained codebook — normally a
  // float-nondeterminism minefield — is bit-reproducible cross-engine
  // and carries a full DuckDB oracle twin (q440/q441).

  /** (id, emb double[], nrm, qemb bigint[]) signature table: embeddings
    * quantized to integer micro-units (ppm). Lloyd sums/means over
    * BIGINT are exact and order-independent — no float accumulation
    * order, no libm — which is what makes a TRAINED quantizer
    * oracle-deterministic. ppm resolution (1e-6 of a coordinate) is far
    * below any embedding's meaningful precision, and 64 dims of
    * (2e6)²-scale squares stay ≤ 2.6e14 ≪ 2^63 per distance.
    */
  private def ppmQuantized(df: DataFrame, idCol: String,
                           embCol: String): DataFrame =
    normalized(df, idCol, embCol)
      .withColumn("qemb",
        expr("transform(emb, x -> CAST(round(x * 1000000) AS BIGINT))"))

  /** [[ppmQuantized]] plus the first-level shard id: the sign pattern
    * of the `shardBits` leading dimensions (the [[signBucket]]
    * quantizer reused as an index PARTITIONER). localCheckpointed —
    * the Lloyd loop, the home assignment and the probe stage all read
    * it.
    */
  private[graft] def shardQuantized(df: DataFrame, idCol: String,
                                    embCol: String,
                                    shardBits: Int): DataFrame =
    ppmQuantized(df, idCol, embCol)
      .withColumn("shard", signBucket(shardBits))
      .localCheckpoint(false)

  /** 32-bit md5 draw on the id — the shared uniform both engines
    * replay exactly (`('0x' || substr(md5(id), 1, 8))::BIGINT` in
    * DuckDB): seeds rank by it, the training slice filters on it.
    */
  private def md5U(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  /** Deterministic IVF seeding: the `kCent` vectors with the smallest
    * (md5(id), id) — a data-independent uniform draw both engines
    * replay exactly (the q109/q397 sampling idiom), picked by the
    * BOUNDED global TopKAggregator, never a global sort.
    */
  private def ivfSeeds(e: DataFrame, kCent: Int): DataFrame =
    e.withColumn("__u", md5U(col("id")))
      .agg(graft.functions.TopKAggregator.topK(kCent,
        -col("__u").cast("double"), col("id")).as("__top"))
      .select(explode(col("__top")).as("t"))
      .select(col("t.id").as("cid"))

  /** Collect a codebook DataFrame (flat `(cid, cemb)` or sharded
    * `(shard, cid, cemb)`; ≤2^16 rows by the hard-capped width
    * schedule) into a driver-pinned [[CellIndex]]. Every internal
    * caller passes a [[pinLocal]]'d LocalRelation, so the collect is a
    * driver-local read, not a job — the same sanctioned bounded class
    * as pinLocal itself. Flat codebooks key every cell under shard 0.
    */
  private def cellIndexOf(cent: DataFrame, k: Int): CellIndex = {
    val sel =
      if (cent.columns.contains("shard"))
        cent.select(col("shard").cast("long"), col("cid"), col("cemb"))
      else cent.select(lit(0L), col("cid"), col("cemb"))
    val rows = sel.collect().map { r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getSeq[Long](2).toArray)
    }
    CellIndex.build(rows, k)
  }

  /** See [[Concurrent.construct]] — overlapped construction of
    * independent sub-plan families (guide §2.6).
    */
  private def runConcurrently(tasks: Seq[() => DataFrame]): Seq[DataFrame] =
    Concurrent.construct(tasks)

  /** Column form of [[CellIndex.nearest]] — the r14 map-only argmin
    * (guide §2.4): per input row, the k nearest own-shard cells of the
    * pinned codebook, ordered (dist ASC NULLS FIRST, cid ASC); empty
    * array for an unknown/null shard. Replaces the
    * broadcast-join + groupBy(id) argmin/TopK chain — one Exchange and
    * one hash aggregate REMOVED per assignment, probe stage and Lloyd
    * round, with bit-identical rows (NearestCellsSpec).
    */
  private def nearestCells(idx: CellIndex, shard: Column,
                           qemb: Column): Column =
    GraftExpr.column(NearestCells(
      GraftExpr.expression(shard.cast("long")),
      GraftExpr.expression(qemb), idx))

  /** Nearest-centroid assignment, map-only: the codebook is already
    * driver-pinned, so the argmin runs per corpus row inside
    * whole-stage codegen (no broadcast join, no groupBy(id) Exchange).
    * Ranking/NULL semantics identical to the replaced
    * min(struct(dist, cid)) chain; the null-cid filter drops rows
    * exactly where the old inner join dropped them (empty codebook).
    */
  private def ivfAssign(e: DataFrame, cent: DataFrame): DataFrame =
    e.select(col("id"),
        get(nearestCells(cellIndexOf(cent, 1), lit(0L), col("qemb")),
          lit(0)).as("cid"))
      .filter(col("cid").isNotNull)

  /** One fused Lloyd round: map-only nearest-cell argmin
    * ([[nearestCells]] over the pinned codebook — no broadcast join,
    * no per-id Exchange) feeding the per-(cell, dim) BIGINT-sum update
    * with exact floor division (s − pmod(s, c)) div c — identical in
    * any engine, unlike float means or truncating/flooring `/`
    * disagreements. Cells that lost every member simply drop out of
    * the codebook (standard k-means attrition; deterministic, mirrored
    * by the oracle).
    */
  private def ivfLloydRound(train: DataFrame, c: DataFrame): DataFrame =
    train.select(
        get(nearestCells(cellIndexOf(c, 1), lit(0L), col("qemb")),
          lit(0)).as("cid"),
        col("qemb"))
      .filter(col("cid").isNotNull)
      .select(col("cid"), posexplode(col("qemb")).as(Seq("dim", "v")))
      .groupBy(col("cid"), col("dim"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
      .withColumn("val", expr("(s - pmod(s, c)) DIV c"))
      .groupBy(col("cid"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, val))), " +
        "p -> p.val)").as("cemb"))

  /** Sharded twin of [[ivfLloydRound]]: shard-local map-only argmin,
    * update fused in-plan.
    */
  private def ivfShardedLloydRound(e: DataFrame, c: DataFrame): DataFrame =
    e.select(
        get(nearestCells(cellIndexOf(c, 1), col("shard"), col("qemb")),
          lit(0)).as("cid"),
        col("shard"), col("qemb"))
      .filter(col("cid").isNotNull)
      .select(col("cid"), col("shard"),
        posexplode(col("qemb")).as(Seq("dim", "v")))
      .groupBy(col("cid"), col("dim"))
      .agg(min(col("shard")).as("shard"), sum(col("v")).as("s"),
        count(lit(1)).as("c"))
      .withColumn("val", expr("(s - pmod(s, c)) DIV c"))
      .groupBy(col("cid"))
      .agg(min(col("shard")).as("shard"),
        expr("transform(array_sort(collect_list(struct(dim, val))), " +
          "p -> p.val)").as("cemb"))

  /** Train the IVF codebook: md5 seeds + `rounds` exact Lloyd rounds
    * over the `sampleMod`-sampled training slice (`u % mod = 0` on the
    * md5 draw; mod = 1 trains on everything). Returns (full signature
    * table, training slice, final centroids, previous-round
    * centroids). Each centroid table is ≤kCent rows —
    * localCheckpointed so the next round's broadcast replays a
    * materialized table, not the whole lineage.
    *
    * Scale: each round is one broadcast-assign (m·kCent distance rows
    * over the m-row slice, map-side) + one (cell, dim) hash agg. With
    * [[ivfSampleMod]]'s ~32·kCent slice the Lloyd cost is ∝ kCent² ∝ n
    * under the width schedule — training no longer sweeps the corpus,
    * which is what retired the flat trainer's n^1.5 (measured ×10.2 at
    * 10× data in round 10). Callers that still assign the FULL corpus
    * (the flat [[ivfAnnTopK]], q444's audit) pay n·kCent there by
    * declaration; the declared ANN (q441) is the sharded layout whose
    * assignment is n·kcPerShard.
    */
  private def ivfFit(df: DataFrame, idCol: String, embCol: String,
                     kCent: Int, rounds: Int, sampleMod: Int = 1)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    // every caller needs cents(rounds - 1); guard HERE so a rounds = 0
    // call fails with a message, not an IndexOutOfBoundsException
    require(rounds >= 1, "IVF training needs at least one Lloyd round")
    val e = ppmQuantized(df, idCol, embCol).localCheckpoint(false)
    val train = if (sampleMod <= 1) e
      else e.filter(pmod(md5U(col("id")), lit(sampleMod)) === 0)
        .localCheckpoint(false)
    val c0 = pinLocal(ivfSeeds(train, kCent)
      .join(train.select(col("id").as("cid"), col("qemb").as("cemb")),
        Seq("cid")))
    val cents = Iterator.iterate(c0)(c =>
      pinLocal(ivfLloydRound(train, c)))
      .take(rounds + 1).toSeq
    (e, train, cents(rounds), cents(rounds - 1))
  }

  /** Materialize a BOUNDED artifact (codebook, ≤kCent·shards rows by
    * the width schedule) as a driver-local relation — the MLlib
    * k-means discipline: the distributed agg that PRODUCES the rows
    * still runs on the cluster, but the artifact itself lives on the
    * driver, so every downstream round broadcasts a LocalTableScan
    * instead of re-planning/executing a checkpointed sub-plan. Under
    * AQE a lazy localCheckpoint is not lazy — AdaptiveSparkPlanExec
    * materializes every shuffle stage of the sub-plan as its own job
    * at CHECKPOINT time (measured: q452 ran 180 driver-blocking jobs
    * during plan construction, ~16 s of scheduling for ~2 MB of
    * data; guide §2.4/§5). Collect here is the sanctioned bounded
    * class (the codebook is the artifact a serving layer freezes).
    */
  private def pinLocal(df: DataFrame): DataFrame = {
    val rows = java.util.Arrays.asList(df.collect(): _*)
    df.sparkSession.createDataFrame(rows, df.schema)
  }

  /** IVF codebook training census — the trained-quantizer health
    * report: per surviving cell, its member count IN THE TRAINING
    * SLICE, centroid L1 mass, and the last Lloyd round's L1 movement
    * (the convergence signal an index build monitors). kCent/rounds/
    * sampleMod are the dials; outputs are exact BIGINTs. With
    * sampleMod > 1 this is the TRAINER's own health report — member
    * counts over the data Lloyd actually saw (full-corpus cell loads
    * belong to the assignment queries); sampleMod = 1 (the default,
    * and the gate sf0.001/sf0.01 regime under [[ivfSampleMod]])
    * reproduces the round-10 full-corpus census bit-for-bit.
    */
  def ivfTrain(df: DataFrame, idCol: String, embCol: String,
               kCent: Int, rounds: Int = 2, sampleMod: Int = 1): DataFrame = {
    val (_, train, cFinal, cPrev) =
      ivfFit(df, idCol, embCol, kCent, rounds, sampleMod)
    val members = ivfAssign(train, cFinal).groupBy(col("cid"))
      .agg(count(lit(1)).as("__n"))
    cFinal.join(members, Seq("cid"), "left")
      .join(cPrev.select(col("cid"), col("cemb").as("__prev")), Seq("cid"))
      .select(col("cid"), coalesce(col("__n"), lit(0L)).as("n_members"),
        expr("aggregate(cemb, 0L, (acc, x) -> acc + abs(x))")
          .as("centroid_l1"),
        // interpreted HOF BY CHOICE: this L1 delta runs over exactly
        // kCent rows ONCE per train (≤ ~512 evaluations at any SF under
        // the width schedule) — the round-13 codegen sweep measured the
        // n·|labels| cluster-quality sites (200k evaluations at sf1) as
        // already inside run-to-run noise, so a kCent-row site is three
        // orders of magnitude below measurability (BENCHLOG r13).
        expr("aggregate(zip_with(cemb, __prev, (a, b) -> abs(a - b)), " +
          "0L, (acc, x) -> acc + x)").as("shift_l1"))
      .orderBy(col("cid"))
  }

  /** ANN top-k over the TRAINED quantizer: index side sits in its
    * nearest cell, query side probes its `nprobe` nearest cells
    * (bounded TopKAggregator over the n·kCent distance rows), then one
    * equi-join on the cell id and exact double cosine within — the
    * same candidate-join discipline as the sign-bucket family, with
    * data-adapted cells. Recall/cost dial = (kCent, nprobe).
    */
  def ivfAnnTopK(df: DataFrame, idCol: String, embCol: String, k: Int,
                 kCent: Int, nprobe: Int = 2, rounds: Int = 2): DataFrame = {
    val (e, _, cFinal, _) = ivfFit(df, idCol, embCol, kCent, rounds)
    // probe list / home assignment AND payload in ONE map-only
    // projection each over the pinned codebook (was: broadcast sweep +
    // TopKAggregator/argmin groupBy(id) + join-back per side — two
    // Exchanges and two joins removed; same (d ASC, cid ASC) order)
    val a = e.select(col("id").as("vec_id"), col("emb").as("a_emb"),
      col("nrm").as("a_nrm"),
      explode(nearestCells(cellIndexOf(cFinal, nprobe), lit(0L),
        col("qemb"))).as("cid"))
    val b = e.select(col("id").as("neighbor_id"), col("emb").as("b_emb"),
        col("nrm").as("b_nrm"),
        get(nearestCells(cellIndexOf(cFinal, 1), lit(0L), col("qemb")),
          lit(0)).as("cid"))
      .filter(col("cid").isNotNull)
    val pairs = a.join(b, "cid")
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("sim", dot("a_emb", "b_emb") / (col("a_nrm") * col("b_nrm")))
      .select(col("vec_id"), col("neighbor_id"), col("sim"))
    selectTopK(pairs, k)
  }

  /** The trained codebook itself — (cid, cemb bigint[]) after `rounds`
    * exact Lloyd rounds. ≤kCent rows: this is the artifact a serving
    * layer freezes and folds into the map-only streaming assigner
    * ([[graft.streaming.StreamingIvfAssign]]), the same
    * train-batch / serve-stream split as the DSIR scorer.
    */
  def ivfCodebook(df: DataFrame, idCol: String, embCol: String,
                  kCent: Int, rounds: Int = 2): DataFrame =
    ivfFit(df, idCol, embCol, kCent, rounds)._3

  /** Sharded trained-IVF ANN — the IMI-style 100 TB layout for the
    * q440 family: a data-INDEPENDENT first level (`shardBits` leading
    * sign bits → 2^shardBits shards) partitions the corpus, then each
    * shard trains its OWN exact-integer codebook and every
    * assignment/probe compares a vector only against its shard's
    * centroids (equi-join on the shard id — the flat form's
    * broadcast-everything n·kCent sweep becomes n·kcPerShard, and each
    * shard's codebook stays bounded no matter how large the corpus
    * grows; this is how the flat trainer's measured ×10 probe ratio is
    * paid down at cluster scale). The FULLY-linear dial setting is the
    * q441 one: shardBits rides the count schedule (so shards ∝ n) with
    * kcPerShard FIXED — assignment stays n·kcPerShard and the mean
    * cell n/(2^shardBits·kc) stays bounded at any corpus size; q441
    * keeps the fixed-4-bit first level as the measured IMI comparison
    * point. Search is shard-local (cross-shard neighbors are foregone,
    * the standard IMI trade — measured per corpus by q449's recall
    * certificate at the round-11 dials, and DIALED AWAY by q452's
    * sweep: q441 now ships its winner, shardBits = max(1, bits − 5),
    * kcPerShard = 16, nprobe = 8, which reads 0.98× the flat layout's
    * recall@5 at 1.34× its candidates/query on the gate corpus). cid =
    * seed vector id stays globally unique, so downstream joins key on
    * cid alone.
    */
  /** Exact integer squared-L2 between a vector and a centroid — the
    * native codegen'd [[graft.functions.SqDistLong]] (bit-identical to
    * the HOF chain it replaced; same NULL contract).
    */
  private val shardQdist = expr("graft_sqdist(qemb, cemb)")

  /** Shard-local nearest-cell assignment, map-only: each vector
    * compares ONLY against its own shard's ≤kcPerShard centroids in
    * the pinned codebook ([[nearestCells]] — no broadcast join, no
    * per-id Exchange); argmin ranking identical to the replaced
    * min(struct(d, cid)), and the null-cid filter drops rows exactly
    * where the old inner equi-join on `shard` dropped them (a shard
    * with no codebook entry).
    */
  private def ivfShardedAssign(e: DataFrame, cent: DataFrame): DataFrame =
    e.select(col("id"),
        get(nearestCells(cellIndexOf(cent, 1), col("shard"),
          col("qemb")), lit(0)).as("cid"))
      .filter(col("cid").isNotNull)

  /** Train the per-shard codebooks: per-shard md5 seeds (bounded
    * TopKAggregator) + `rounds` shard-local exact Lloyd rounds.
    * Returns (sharded signature table, final (cid, shard, cemb)
    * codebook).
    */
  private def ivfShardedFit(df: DataFrame, idCol: String, embCol: String,
                            kcPerShard: Int, rounds: Int,
                            shardBits: Int): (DataFrame, DataFrame) = {
    val e = shardQuantized(df, idCol, embCol, shardBits)
    (e, ivfShardedFitOn(e, kcPerShard, rounds))
  }

  /** The Lloyd half of [[ivfShardedFit]] over a pre-built sharded
    * signature table — factored out so the dial sweep (q452) trains
    * its three per-shard codebook widths off ONE shardQuantized scan
    * per shard level instead of re-quantizing the corpus per dial.
    */
  private def ivfShardedFitOn(e: DataFrame, kcPerShard: Int,
                              rounds: Int): DataFrame = {
    require(rounds >= 1, "sharded IVF training needs at least one round")
    val seeds = e.withColumn("__u", md5U(col("id")))
      .groupBy(col("shard"))
      .agg(graft.functions.TopKAggregator.topK(kcPerShard,
        -col("__u").cast("double"), col("id")).as("__top"))
      .select(col("shard"), explode(col("__top")).as("t"))
      .select(col("shard"), col("t.id").as("cid"))
    val c0 = pinLocal(seeds
      .join(e.select(col("id").as("cid"), col("qemb").as("cemb")),
        Seq("cid")))
    Iterator.iterate(c0)(c =>
      pinLocal(ivfShardedLloydRound(e, c)))
      .drop(rounds).next()
  }

  /** Per-vector `nprobe` nearest own-shard cells — map-only
    * [[nearestCells]] over the pinned codebook + explode (was a
    * broadcast join + TopKAggregator groupBy(id): one Exchange and one
    * hash aggregate removed; same (d ASC, cid ASC) order).
    */
  private def ivfShardedProbes(e: DataFrame, cFinal: DataFrame,
                               nprobe: Int): DataFrame =
    e.select(col("id"),
      explode(nearestCells(cellIndexOf(cFinal, nprobe), col("shard"),
        col("qemb"))).as("cid"))

  /** Frozen-index sharded SEARCH core: route each query row of `q` (a
    * sharded signature table — same shape as `e`) to its `nprobe`
    * nearest own-shard cells, equi-join the cell ids against the
    * frozen home assignment of the INDEX side `e`, exact double cosine
    * within, bounded top-k. This is the serving path a 100 TB online
    * recall layer runs per request micro-batch: per query the cost is
    * kcPerShard distance rows (route) + nprobe bounded cells
    * (candidates) — independent of corpus size. Shared by the
    * full-corpus ANN (q441/q448 via [[ivfShardedSearchOn]]'s folded
    * index side: q = e), the declared serving twin
    * ([[ivfServeSharded]], q453) and the streaming micro-batch spec
    * (StreamingIvfServeSpec drives THIS function per micro-batch and
    * pins parity against the batch result).
    */
  private[graft] def ivfShardedSearch(q: DataFrame, e: DataFrame,
                                      home: DataFrame, cFinal: DataFrame,
                                      nprobe: Int, k: Int): DataFrame =
    // the serving shape keeps its FROZEN home-assignment table (a real
    // index artifact, e.g. read back from storage), joined to the
    // payload once
    ivfShardedSearchOn(q,
      home.join(e, "id")
        .select(col("id").as("neighbor_id"), col("emb").as("b_emb"),
          col("nrm").as("b_nrm"), col("cid")),
      cFinal, nprobe, k)

  /** The search tail over a prebuilt candidate index side `b`
    * (neighbor_id, b_emb, b_nrm, cid): map-only probe projection on
    * the query side, equi-join on the cell id, exact double cosine,
    * bounded top-k.
    */
  private def ivfShardedSearchOn(q: DataFrame, b: DataFrame,
                                 cFinal: DataFrame,
                                 nprobe: Int, k: Int): DataFrame = {
    // probe list AND payload in ONE map-only projection: the probes
    // come from the pinned-codebook kernel, so the old
    // probes-join-back-to-q shuffle is vestigial (r14, guide §2.4)
    val a = q.select(col("id").as("vec_id"), col("emb").as("a_emb"),
      col("nrm").as("a_nrm"),
      explode(nearestCells(cellIndexOf(cFinal, nprobe), col("shard"),
        col("qemb"))).as("cid"))
    val pairs = a.join(b, "cid")
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("sim", dot("a_emb", "b_emb") / (col("a_nrm") * col("b_nrm")))
      .select(col("vec_id"), col("neighbor_id"), col("sim"))
    selectTopK(pairs, k)
  }

  def ivfAnnTopKSharded(df: DataFrame, idCol: String, embCol: String,
                        k: Int, kcPerShard: Int, nprobe: Int = 2,
                        rounds: Int = 2, shardBits: Int = 4): DataFrame = {
    val (e, cFinal) = ivfShardedFit(df, idCol, embCol, kcPerShard,
      rounds, shardBits)
    // full-corpus ANN trains and searches in one plan, so the home
    // assignment folds into the index-side projection map-only (the
    // ivfProbeCands b-side shape) — one self-join of the signature
    // checkpoint removed; the serving twin (q453) keeps the frozen
    // home table through [[ivfShardedSearch]] by design.
    val b = e.select(col("id").as("neighbor_id"), col("emb").as("b_emb"),
        col("nrm").as("b_nrm"),
        get(nearestCells(cellIndexOf(cFinal, 1), col("shard"),
          col("qemb")), lit(0)).as("cid"))
      .filter(col("cid").isNotNull)
    ivfShardedSearchOn(e, b, cFinal, nprobe, k)
  }

  /** Declared serving twin of the sharded STREAMING recall path
    * (q453): train the q441-dial index once, freeze it (codebook +
    * home assignment), then answer a 1-in-`queryMod` md5-sampled
    * request stream of query vectors through [[ivfShardedSearch]] —
    * route to shard, probe `nprobe` own-shard cells, exact cosine,
    * top-k. The md5 draw stands in for the online request sample; the
    * streaming twin (StreamingIvfServeSpec) drives the SAME search
    * core per rate-limited micro-batch and asserts row parity with
    * this batch plan, the stream ≡ batch contract of the DSIR scorer
    * family. Per-request cost is kcPerShard + nprobe·cell — corpus-
    * size-independent, the shape that survives 100 TB serving.
    */
  def ivfServeSharded(df: DataFrame, idCol: String, embCol: String,
                      k: Int, kcPerShard: Int, nprobe: Int,
                      rounds: Int, shardBits: Int,
                      queryMod: Int): DataFrame = {
    val (e, home, cFinal) = ivfShardedFreeze(df, idCol, embCol,
      kcPerShard, rounds, shardBits)
    val q = e.filter(pmod(md5U(col("id")), lit(queryMod)) === 0)
    ivfShardedSearch(q, e, home, cFinal, nprobe, k)
  }

  /** Freeze the sharded index for serving: (sharded signature table,
    * frozen home assignment, trained codebook) — the artifact set a
    * serving layer trains once in batch and then drives request
    * micro-batches against (StreamingIvfServeSpec does exactly that
    * through [[ivfShardedSearch]]).
    */
  private[graft] def ivfShardedFreeze(df: DataFrame, idCol: String,
                                      embCol: String, kcPerShard: Int,
                                      rounds: Int, shardBits: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val (e, cFinal) = ivfShardedFit(df, idCol, embCol, kcPerShard,
      rounds, shardBits)
    (e, ivfShardedAssign(e, cFinal), cFinal)
  }

  /** The 100 TB serving LAYOUT, materialized: freeze the sharded index
    * and write it as a CELL-PARTITIONED parquet table (partition
    * column `pcell` = "<shard>_<cid>", ≤ 2^shardBits · kcPerShard
    * distinct values), repartitioned by pcell first so each cell is a
    * compact file set. A request then never scans the corpus: the
    * router probes the broadcast codebook and reads back ONLY its
    * probed cells via partition-PRUNED point reads — the storage
    * analogue of an ANN server's in-memory posting lists, and the
    * mechanism [[ivfServeBatchPruned]] measures (graft.ServeBench).
    * Returns the frozen codebook for the router.
    */
  def ivfServeIndexWrite(df: DataFrame, idCol: String, embCol: String,
                         kcPerShard: Int, rounds: Int, shardBits: Int,
                         path: String): DataFrame = {
    val (e, home, cFinal) = ivfShardedFreeze(df, idCol, embCol,
      kcPerShard, rounds, shardBits)
    home.join(e, "id")
      .select(col("id"), col("emb"), col("nrm"),
        concat_ws("_", col("shard"), col("cid")).as("pcell"))
      .repartition(col("pcell"))
      .write.mode("overwrite").partitionBy("pcell").parquet(path)
    cFinal
  }

  /** One serving micro-batch against the [[ivfServeIndexWrite]]
    * layout: route each request to its `nprobe` nearest own-shard
    * cells (kcPerShard broadcast distances per request — the
    * graft_sqdist kernel), collect the tiny distinct probed-cell list
    * (the router's request-path lookup, ≤ batch·nprobe values), and
    * read ONLY those cells back through the parquet partition filter —
    * per-batch data touched is Σ probed cell sizes, independent of
    * corpus row count. Exact double cosine within the candidates,
    * bounded top-k. Rows are identical to [[ivfShardedSearch]] on the
    * same frozen index (ServeBench asserts that parity before
    * timing).
    */
  def ivfServeBatchPruned(requests: DataFrame, idCol: String,
                          embCol: String, index: DataFrame,
                          cFinal: DataFrame, shardBits: Int,
                          nprobe: Int, k: Int): DataFrame = {
    val q = shardQuantized(requests, idCol, embCol, shardBits)
    // probe list, shard AND payload in one map-only projection (the
    // pinned-codebook kernel; no join-back — r14, guide §2.4)
    val probes = q.select(col("id"), col("shard"), col("emb"),
        col("nrm"),
        explode(nearestCells(cellIndexOf(cFinal, nprobe), col("shard"),
          col("qemb"))).as("cid"))
      .withColumn("pcell", concat_ws("_", col("shard"), col("cid")))
    val cells = probes.select("pcell").distinct()
      .collect().map(_.getString(0)).toSeq
    // `index` is the ONCE-opened table handle (spark.read.parquet of
    // the ivfServeIndexWrite path): its InMemoryFileIndex lists the
    // cell directories a single time at open, and this per-batch
    // partition filter prunes against that cached listing. Re-opening
    // the path per batch instead re-LISTS every cell directory on the
    // driver — O(total cells) = O(corpus) per request batch, which is
    // exactly the corpus-size dependence the layout exists to remove
    // (measured: it alone doubled sf1 batch latency in ServeBench).
    val idx = index.filter(col("pcell").isin(cells: _*))
    val a = probes.join(q, "id")
      .select(col("id").as("vec_id"), col("emb").as("a_emb"),
        col("nrm").as("a_nrm"), col("pcell"))
    val b = idx.select(col("id").as("neighbor_id"),
      col("emb").as("b_emb"), col("nrm").as("b_nrm"), col("pcell"))
    val pairs = a.join(b, "pcell")
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("sim",
        dot("a_emb", "b_emb") / (col("a_nrm") * col("b_nrm")))
      .select(col("vec_id"), col("neighbor_id"), col("sim"))
    selectTopK(pairs, k)
  }

  /** The trained PER-SHARD codebook — (shard, cid, cemb bigint[]):
    * the artifact a serving layer freezes and folds into the map-only
    * sharded streaming assigner
    * ([[graft.streaming.StreamingIvfAssign.assignSharded]]), the same
    * train-batch / serve-stream split as the flat [[ivfCodebook]].
    */
  def ivfShardedCodebook(df: DataFrame, idCol: String, embCol: String,
                         kcPerShard: Int, rounds: Int = 2,
                         shardBits: Int = 4): DataFrame =
    ivfShardedFit(df, idCol, embCol, kcPerShard, rounds, shardBits)._2
      .select(col("shard"), col("cid"), col("cemb"))

  /** Batch twin of the sharded STREAMING assigner
    * ([[graft.streaming.StreamingIvfAssign.assignSharded]]): assign
    * vectors to the cells of a FROZEN (shard, cid, cemb) codebook — no
    * training, just the shard routing + shard-local argmin. Output is
    * the stream's (id, shard, cid, dist2) contract INCLUDING its
    * dead-letter rows: a vector routed to a shard with no codebook
    * entry, or one whose distance cannot be computed (malformed /
    * wrong-dimension embedding), emits NULL cid/dist2 via the LEFT
    * join — never a silent drop and never a phantom argmin over NULL
    * distances. The spec pins stream ≡ batch on this pair, dead
    * letters included. (Training-loop assignment keeps the inner-join
    * [[ivfShardedAssign]]: there every vector's shard has ≥1 seed by
    * construction.)
    */
  def ivfShardedAssignFrozen(df: DataFrame, idCol: String,
                             embCol: String, codebook: DataFrame,
                             shardBits: Int): DataFrame = {
    val e = shardQuantized(df, idCol, embCol, shardBits)
    val assigned = e.select(col("id"), col("shard"), col("qemb"))
      .join(broadcast(codebook), Seq("shard"))
      .withColumn("__d", shardQdist)
      .filter(col("__d").isNotNull)
      .groupBy(col("id"))
      .agg(min(struct(col("__d"), col("cid"))).as("__m"))
      .select(col("id"), col("__m.cid").as("cid"),
        col("__m.__d").as("dist2"))
    e.select(col("id"), col("shard"))
      .join(assigned, Seq("id"), "left")
      .select(col("id"), col("shard"), col("cid"), col("dist2"))
  }

  /** Measured recall certificate for the SHARDED trained quantizer
    * (q449) — [[ivfRecallAudit]]'s shape on [[ivfAnnTopKSharded]]'s
    * layout at the SAME dials as the declared q441: recall@k per
    * own-shard nprobe ∈ {1, 2, 3} vs the exact top-k of a
    * 1-in-`sampleMod` md5-class query sample over the FULL corpus —
    * so cross-shard true neighbors (the IMI shard-locality trade this
    * layout deliberately forgoes) count AGAINST recall here; the gap
    * between this table and q444's flat numbers IS the measured price
    * of sharding. Same deliberate-cartesian whitelist class as
    * q397/q438/q439/q444 (the exact side samples the corpus once).
    */
  def ivfRecallAuditSharded(df: DataFrame, idCol: String, embCol: String,
                            k: Int, kcPerShard: Int, shardBits: Int,
                            sampleMod: Int = 20,
                            rounds: Int = 2): DataFrame = {
    val (e, cFinal) = ivfShardedFit(df, idCol, embCol, kcPerShard,
      rounds, shardBits)
    val q = e.filter(pmod(col("id"), lit(sampleMod)) === 0)
      .localCheckpoint(false)
    val exact = selectTopK(pairSim(q, e), k)
      .select(col("vec_id"), col("neighbor_id"), lit(1L).as("__e"))
    // probe ranks / home assignment AND payload in one map-only
    // projection per side (pinned-codebook kernel; the old join-backs
    // were vestiges of the groupBy(id) form — r14, guide §2.4)
    val a = q.select(col("id").as("vec_id"), col("emb").as("a_emb"),
        col("nrm").as("a_nrm"),
        posexplode(nearestCells(cellIndexOf(cFinal, 3), col("shard"),
          col("qemb"))).as(Seq("__p", "cid")))
      .withColumn("pr", (col("__p") + 1).cast("long"))
    val b = e.select(col("id").as("neighbor_id"), col("emb").as("b_emb"),
        col("nrm").as("b_nrm"),
        get(nearestCells(cellIndexOf(cFinal, 1), col("shard"),
          col("qemb")), lit(0)).as("cid"))
      .filter(col("cid").isNotNull)
    val cand = a.join(b, "cid")
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("sim", dot("a_emb", "b_emb") / (col("a_nrm") * col("b_nrm")))
      .groupBy(col("vec_id"), col("neighbor_id"))
      .agg(min(col("pr")).as("pr"), max(col("sim")).as("sim"))
      // three nprobe filters read the candidate table.
      .localCheckpoint(false)
    val ann = Seq(1, 2, 3).map { lvl =>
      selectTopK(cand.filter(col("pr") <= lvl)
          .select(col("vec_id"), col("neighbor_id"), col("sim")), k)
        .withColumn("nprobe", lit(lvl.toLong))
    }.reduce(_ unionAll _)
    val nq = q.agg(count(lit(1)).as("__nq"))
    ann.join(exact, Seq("vec_id", "neighbor_id"), "left")
      .groupBy(col("nprobe"))
      .agg(count(col("__e")).as("n_hits"))
      .crossJoin(broadcast(nq))
      .select(lit(shardBits.toLong).as("shard_bits"), col("nprobe"),
        col("__nq").as("n_queries"), col("n_hits"),
        expr(s"CAST((n_hits * 2000000 + $k * __nq) " +
          s"div (2 * $k * __nq) AS BIGINT)").as("recall_ppm"))
  }

  /** Measured recall certificate for the TRAINED quantizer — the
    * q438/q439 audit shape applied to [[ivfAnnTopK]]: recall@k per
    * nprobe ∈ {1, 2, 3} against the exact top-k of a 1-in-`sampleMod`
    * md5-class query sample (the sampled brute-force ground truth —
    * same deliberate-cartesian whitelist class as q397/q438/q439).
    * Read next to q438/q439 this answers the index-design question
    * directly: does adapting cells to corpus density buy recall over
    * the data-independent sign planes at equal candidate cost?
    */
  /** Multi-probe candidate-pair table over the FLAT trained codebook:
    * each query's `maxProbe` nearest cells (bounded TopKAggregator
    * over the broadcast codebook distances) equi-joined to the home
    * assignments — one row per DISTINCT reachable pair, tagged with
    * its minimum probe rank `pr` and cosine. localCheckpointed — the
    * per-nprobe recall filters AND q450's candidate counts read it.
    */
  private def ivfProbeCands(q: DataFrame, e: DataFrame,
                            cFinal: DataFrame,
                            maxProbe: Int = 3): DataFrame = {
    // probe ranks / home assignment AND payload in one map-only
    // projection per side over the pinned codebook — no groupBy(id),
    // no join-backs (r14, guide §2.4)
    val a = q.select(col("id").as("vec_id"), col("emb").as("a_emb"),
        col("nrm").as("a_nrm"),
        posexplode(nearestCells(cellIndexOf(cFinal, maxProbe), lit(0L),
          col("qemb"))).as(Seq("__p", "cid")))
      .withColumn("pr", (col("__p") + 1).cast("long"))
    val b = e.select(col("id").as("neighbor_id"), col("emb").as("b_emb"),
        col("nrm").as("b_nrm"),
        get(nearestCells(cellIndexOf(cFinal, 1), lit(0L), col("qemb")),
          lit(0)).as("cid"))
      .filter(col("cid").isNotNull)
    a.join(b, "cid")
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("sim", dot("a_emb", "b_emb") / (col("a_nrm") * col("b_nrm")))
      .groupBy(col("vec_id"), col("neighbor_id"))
      .agg(min(col("pr")).as("pr"), max(col("sim")).as("sim"))
      .localCheckpoint(false)
  }

  /** [[ivfProbeCands]]'s shape on the SHARDED layout: each query's
    * `maxProbe` nearest OWN-SHARD cells (equi-join on shard — never
    * the flat broadcast-everything sweep) equi-joined to the frozen
    * home assignments; one row per DISTINCT reachable (query,
    * neighbor) pair tagged with its minimum probe rank and cosine.
    * localCheckpointed — the dial sweep's per-nprobe recall filters
    * and candidate counts all read it.
    */
  private def ivfShardedProbeCands(q: DataFrame, e: DataFrame,
                                   cFinal: DataFrame,
                                   maxProbe: Int): DataFrame = {
    // same map-only probe/assign projections as [[ivfProbeCands]],
    // shard-local
    val a = q.select(col("id").as("vec_id"), col("emb").as("a_emb"),
        col("nrm").as("a_nrm"),
        posexplode(nearestCells(cellIndexOf(cFinal, maxProbe),
          col("shard"), col("qemb"))).as(Seq("__p", "cid")))
      .withColumn("pr", (col("__p") + 1).cast("long"))
    val b = e.select(col("id").as("neighbor_id"), col("emb").as("b_emb"),
        col("nrm").as("b_nrm"),
        get(nearestCells(cellIndexOf(cFinal, 1), col("shard"),
          col("qemb")), lit(0)).as("cid"))
      .filter(col("cid").isNotNull)
    a.join(b, "cid")
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("sim", dot("a_emb", "b_emb") / (col("a_nrm") * col("b_nrm")))
      .groupBy(col("vec_id"), col("neighbor_id"))
      .agg(min(col("pr")).as("pr"), max(col("sim")).as("sim"))
      .localCheckpoint(false)
  }

  def ivfRecallAudit(df: DataFrame, idCol: String, embCol: String,
                     k: Int, kCent: Int, sampleMod: Int = 20,
                     rounds: Int = 2, trainMod: Int = 1): DataFrame = {
    // trainMod > 1 puts the Lloyd rounds on the q440 md5-sampled slice
    // (32·kCent vectors) — the round-12 fix for this audit's measured
    // full-corpus-training drift (×13.7 → ×17.9 at 10× data): the
    // certificate only needs a REPRESENTATIVE codebook, and only the
    // one home-assignment sweep plus the declared-quadratic sampled
    // exact side still read the whole corpus.
    val (e, _, cFinal, _) = ivfFit(df, idCol, embCol, kCent, rounds,
      trainMod)
    val q = e.filter(pmod(col("id"), lit(sampleMod)) === 0)
      .localCheckpoint(false)
    val exact = selectTopK(pairSim(q, e), k)
      .select(col("vec_id"), col("neighbor_id"), lit(1L).as("__e"))
    // three nprobe filters read the shared candidate table.
    val cand = ivfProbeCands(q, e, cFinal)
    val ann = Seq(1, 2, 3).map { lvl =>
      selectTopK(cand.filter(col("pr") <= lvl)
          .select(col("vec_id"), col("neighbor_id"), col("sim")), k)
        .withColumn("nprobe", lit(lvl.toLong))
    }.reduce(_ unionAll _)
    val nq = q.agg(count(lit(1)).as("__nq"))
    ann.join(exact, Seq("vec_id", "neighbor_id"), "left")
      .groupBy(col("nprobe"))
      .agg(count(col("__e")).as("n_hits"))
      .crossJoin(broadcast(nq))
      .select(col("nprobe"), col("__nq").as("n_queries"), col("n_hits"),
        expr(s"CAST((n_hits * 2000000 + $k * __nq) " +
          s"div (2 * $k * __nq) AS BIGINT)").as("recall_ppm"))
  }

  /** Recall-per-CANDIDATE audit (q450) — the index-design question
    * q438 vs q444 left open, answered on equal terms: do
    * density-ADAPTED cells (trained IVF) beat the data-independent
    * sign planes at equal candidate cost? Both quantizers are built at
    * the SAME geometry — 2^bits cells, bits = [[adaptiveSignBits]] —
    * over the same corpus, probed at their three levels (Hamming ≤
    * 0/1/2; nprobe 1/2/3) against ONE shared 1-in-`sampleMod` exact
    * ground truth, and every row reports the DISTINCT candidate pairs
    * that level examined next to its recall — so the reader compares
    * recall at matched candidates-per-query, not at incomparable
    * probe-level labels. Same deliberate-cartesian whitelist class as
    * q397/q438/q444 (one sampled exact side, shared by both methods).
    *
    * Cost contract (round 12): the audit runs on a BOUNDED md5-sampled
    * DEV SLICE of ~`devCap` vectors (1-in-max(1, n/devCap) on the id
    * draw; mod = 1 at or below the cap, so small corpora audit
    * everything) and the 2^bits geometry derives from the SLICE count.
    * This is not an optimization dodge but the only shape under which
    * the equal-geometry question is answerable at bounded cost: with
    * kCent = 2^bits the width schedule keeps 32·kCent ≥ n at EVERY
    * corpus size, so the q440 trainer-sampling fix can never fire here
    * (its mod is always 1), and a full-corpus run is ∝ n² in training
    * AND home assignment — the round-11 measured ×80.5 at 10× data.
    * Picking an index design from a bounded representative sample is
    * also the actual workflow (the FAISS-guideline shape): the audit
    * answers "which quantizer family, at what candidate budget", and
    * the production layout it justifies (q441) then builds on the full
    * corpus. Every audit cost is now ∝ devCap², constant in n.
    */
  def recallPerCandidateAudit(df: DataFrame, idCol: String,
                              embCol: String, k: Int,
                              sampleMod: Int = 20,
                              devCap: Int = 1000): DataFrame = {
    val devMod = math.max(1L, df.count() / devCap).toInt
    val dev = if (devMod <= 1) df
      else df.filter(pmod(md5U(col(idCol)), lit(devMod)) === 0)
    val bits = adaptiveSignBits(dev)
    // The sign-bucket side (signature, sample, shared exact ground
    // truth) and the trained-IVF side (Lloyd fit at the SAME cell
    // count kCent = 2^bits, over the same dev slice) are independent
    // sub-plan families whose checkpoints/collects block the driver —
    // build them concurrently (guide §2.6, the ivfDialSweep pattern;
    // both sides are deterministic pure functions of dev).
    var signSide: (DataFrame, DataFrame, DataFrame) = null
    var ivfCand: DataFrame = null
    runConcurrently(Seq(
      () => {
        val n = normalized(dev, idCol, embCol)
          .withColumn("bucket", signBucket(bits))
          .localCheckpoint(false)
        val qs = n.filter(pmod(col("id"), lit(sampleMod)) === 0)
        val exact = selectTopK(pairSim(qs, n), k)
          .select(col("vec_id"), col("neighbor_id"), lit(1L).as("__e"))
          .localCheckpoint(false)
        signSide = (qs, exact, signProbeCands(qs, n, bits))
        exact
      },
      () => {
        val (e, _, cFinal, _) = ivfFit(dev, idCol, embCol, 1 << bits, 2)
        val qi = e.filter(pmod(col("id"), lit(sampleMod)) === 0)
        ivfCand = ivfProbeCands(qi, e, cFinal)
        ivfCand
      }))
    val (qs, exact, signCand) = signSide
    val nq = qs.agg(count(lit(1)).as("__nq"))
    // ONE plan, not 12 per-level jobs: per method, the tagged per-level
    // top-k lists union into a single (method, setting) hits agg, and
    // the per-level candidate counts come from one pass that explodes
    // each pair into every level that reaches it (sequence(lvl, max)).
    def hits(cand: DataFrame, lvlCol: String, lvls: Seq[Int],
             method: String): DataFrame =
      lvls.map { lvl =>
        selectTopK(cand.filter(col(lvlCol) <= lvl)
            .select(col("vec_id"), col("neighbor_id"), col("sim")), k)
          .withColumn("setting", lit(lvl.toLong))
      }.reduce(_ unionAll _)
        .join(exact, Seq("vec_id", "neighbor_id"), "left")
        .groupBy(col("setting"))
        .agg(count(col("__e")).as("n_hits"))
        .withColumn("method", lit(method))
    def cands(cand: DataFrame, lvlCol: String, maxLvl: Int,
              method: String): DataFrame =
      cand.select(explode(expr(s"sequence(CAST($lvlCol AS BIGINT), " +
          s"${maxLvl}L)")).as("setting"))
        .groupBy(col("setting"))
        .agg(count(lit(1)).as("n_candidates"))
        .withColumn("method", lit(method))
    val h = hits(signCand, "hd", Seq(0, 1, 2), "sign_bucket")
      .unionAll(hits(ivfCand, "pr", Seq(1, 2, 3), "ivf_trained"))
    val c = cands(signCand, "hd", 2, "sign_bucket")
      .unionAll(cands(ivfCand, "pr", 3, "ivf_trained"))
    // LEFT-join both aggs onto a literal six-row (method, setting)
    // scaffold so a probe level with zero candidates still emits its
    // row with zero counts — the oracle's unnest scaffold always
    // produces all six rows, and on a tiny/degenerate corpus the
    // grouped-only form would silently drop levels.
    val spark = df.sparkSession
    import spark.implicits._
    val scaffold = (Seq(0L, 1L, 2L).map(("sign_bucket", _)) ++
        Seq(1L, 2L, 3L).map(("ivf_trained", _)))
      .toDF("method", "setting")
    scaffold.join(h, Seq("method", "setting"), "left")
      .join(c, Seq("method", "setting"), "left")
      .crossJoin(broadcast(nq))
      .select(col("method"), col("setting"),
        col("__nq").as("n_queries"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        expr("CAST((coalesce(n_candidates, 0) * 2 + __nq) " +
          "div (2 * __nq) AS BIGINT)").as("cand_per_query"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr(s"CAST((coalesce(n_hits, 0) * 2000000 + $k * __nq) " +
          s"div (2 * $k * __nq) AS BIGINT)").as("recall_ppm"))
      .orderBy(col("method"), col("setting"))
  }

  /** One dial's rows for [[ivfDialSweep]]: per probe level in `lvls`,
    * the bounded top-k hits against the shared exact side plus the
    * DISTINCT candidate pairs that level examined, left-joined onto a
    * literal per-level scaffold (a level with zero candidates still
    * emits its zero row — the q450 scaffold discipline).
    */
  private def dialRows(cand: DataFrame, exact: DataFrame, k: Int,
                       lvls: Seq[Int], layout: String, sb: Int,
                       kc: Int): DataFrame = {
    val spark = cand.sparkSession
    import spark.implicits._
    val hits = lvls.map { lvl =>
      selectTopK(cand.filter(col("pr") <= lvl)
          .select(col("vec_id"), col("neighbor_id"), col("sim")), k)
        .withColumn("nprobe", lit(lvl.toLong))
    }.reduce(_ unionAll _)
      .join(exact, Seq("vec_id", "neighbor_id"), "left")
      .groupBy(col("nprobe"))
      .agg(count(col("__e")).as("n_hits"))
    // candidate counts: one pass — each pair explodes into every
    // swept level that reaches it (pr ≤ level), then a per-level count
    val lvlArr = lvls.map(l => s"${l}L").mkString("array(", ", ", ")")
    val cnts = cand
      .select(explode(expr(s"filter($lvlArr, s -> s >= pr)"))
        .as("nprobe"))
      .groupBy(col("nprobe"))
      .agg(count(lit(1)).as("n_candidates"))
    lvls.map(_.toLong).toDF("nprobe")
      .join(hits, Seq("nprobe"), "left")
      .join(cnts, Seq("nprobe"), "left")
      .select(lit(layout).as("layout"), lit(sb.toLong).as("shard_bits"),
        lit(kc.toLong).as("kc"), col("nprobe"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }

  /** Recall-DIAL sweep for the sharded trained IVF (q452) — the
    * certificate that buys back the measured IMI shard-locality loss
    * (q449: 13-23% @ q441's round-11 default dials vs flat q444's
    * 19-42%): every (shardBits, kcPerShard, nprobe) combination in the
    * swept grid is measured against ONE shared 1-in-`sampleMod` exact
    * ground truth over the FULL corpus — cross-shard true neighbors
    * count AGAINST recall, exactly as in q449 — and each row reports
    * the DISTINCT candidate pairs that dial examined (the q450
    * recall-per-candidate discipline), so "recovers flat recall at
    * bounded candidate cost" is a read-off, not a narrative. The flat
    * layout at q444's geometry rides along as the reference rows
    * (layout = 'flat', shard_bits = 0, trained on the q440 sampled
    * slice), giving the flat recall AND its candidate budget in the
    * same table. Reference analogue: the ES kNN check tunes
    * k/num_candidates explicitly (s2_item_to_es.py:85-90,
    * online/utils/es_caller.py:43). Same deliberate-cartesian
    * whitelist class as q444/q449/q450 (the one sampled exact side);
    * every sharded side is equi-join-bounded: training n·kcPerShard
    * per round, probes n_q·kcPerShard, candidates nprobe·cell.
    */
  def ivfDialSweep(df: DataFrame, idCol: String, embCol: String,
                   k: Int, flatKc: Int, flatTrainMod: Int,
                   shardBitsList: Seq[Int], kcs: Seq[Int],
                   nprobes: Seq[Int], sampleMod: Int = 20): DataFrame = {
    // shared exact ground truth (the declared-quadratic sampled side)
    val nn = normalized(df, idCol, embCol).localCheckpoint(false)
    val qn = nn.filter(pmod(col("id"), lit(sampleMod)) === 0)
    val exact = selectTopK(pairSim(qn, nn), k)
      .select(col("vec_id"), col("neighbor_id"), lit(1L).as("__e"))
      .localCheckpoint(false)
    val nq = qn.agg(count(lit(1)).as("__nq"))
    // The flat reference and every (shardBits, kcPerShard) dial train
    // and checkpoint INDEPENDENT sub-plans, but each one's Lloyd
    // collects and candidate-table checkpoints are driver-BLOCKING
    // jobs — built sequentially they serialize ~7 dials of
    // job-scheduling latency. Build them from a small driver pool
    // (guide §2.6 overlap independent jobs): results are unchanged
    // (each dial is a deterministic pure function of df and its dials;
    // the union order below is fixed by the task list, and the output
    // is orderBy'd anyway). One shardQuantized scan per shard level,
    // one trained codebook per (shardBits, kcPerShard), as before.
    val shardLevels = shardBitsList.map { sb =>
      val es = shardQuantized(df, idCol, embCol, sb)
      (sb, es, es.filter(pmod(col("id"), lit(sampleMod)) === 0))
    }
    val flatTask: () => DataFrame = () => {
      val (ef, _, cf, _) = ivfFit(df, idCol, embCol, flatKc, 2,
        flatTrainMod)
      val qf = ef.filter(pmod(col("id"), lit(sampleMod)) === 0)
      dialRows(ivfProbeCands(qf, ef, cf, 3),
        exact, k, Seq(1, 2, 3), "flat", 0, flatKc)
    }
    val shardTasks: Seq[() => DataFrame] = for {
      (sb, es, qsAll) <- shardLevels
      kc <- kcs
    } yield { () =>
      val cs = ivfShardedFitOn(es, kc, 2)
      val cand = ivfShardedProbeCands(qsAll, es, cs, nprobes.max)
      dialRows(cand, exact, k, nprobes, "sharded", sb, kc)
    }
    runConcurrently(flatTask +: shardTasks).reduce(_ unionAll _)
      .crossJoin(broadcast(nq))
      .select(col("layout"), col("shard_bits"), col("kc"),
        col("nprobe"), col("__nq").as("n_queries"),
        col("n_candidates"),
        expr("CAST((n_candidates * 2 + __nq) div (2 * __nq) " +
          "AS BIGINT)").as("cand_per_query"),
        col("n_hits"),
        expr(s"CAST((n_hits * 2000000 + $k * __nq) " +
          s"div (2 * $k * __nq) AS BIGINT)").as("recall_ppm"))
      .orderBy(col("layout"), col("shard_bits"), col("kc"),
        col("nprobe"))
  }
}
