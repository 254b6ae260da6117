package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Serving-snapshot operators — the engine's replacement for the
  * reference's Redis/ES export+lookup hop (SURVEY §2.1 S7/S8):
  *
  *  - the per-user state (term list, vector, seen-filter) becomes a
  *    keyed snapshot table with the same comma-joined string encoding
  *    the Redis hashes use (offline_to_online/recall/
  *    s1_user_to_redis.py:24-36, F2), persistable as keyed parquet;
  *  - the online `hget`-with-defaults becomes a left join + per-field
  *    coalesce (online/utils/redis_caller.py:12-37, P9) — including the
  *    reference's exact miss defaults (term→[], vector→[1]*dim,
  *    filter→[]).
  *
  * Scale: the snapshot is keyed parquet (splittable; broadcastable when
  * the active-user set is small); lookups are broadcast or shuffled
  * hash joins, never per-row RPCs.
  */
object ServingOps {

  /** Build the serving snapshot: per-user comma-joined term/filter
    * strings + vector. Inputs are the artifact tables the offline
    * pipeline produces (termSnapshot output, ordered seen lists, ALS
    * user vectors).
    */
  def buildSnapshot(terms: DataFrame, seen: DataFrame, vectors: DataFrame,
                    keyCol: String): DataFrame =
    vectors.select(col(keyCol), col("vector"))
      .join(terms.select(col(keyCol), col("terms")), Seq(keyCol), "full")
      .join(seen.select(col(keyCol), col("seen")), Seq(keyCol), "full")
      .select(col(keyCol),
        array_join(coalesce(col("terms"), array()), ",").as("term_str"),
        array_join(coalesce(col("vector"), array()), ",").as("vector_str"),
        array_join(coalesce(col("seen"), array()), ",").as("filter_str"))

  /** Point lookup with the reference's per-field miss defaults:
    * term→[], vector→[1.0]*dim, filter→[] (redis_caller.py:19-35).
    * Decodes the comma-joined strings back to typed arrays (F2
    * parse-back).
    */
  def pointLookup(requests: DataFrame, snapshot: DataFrame,
                  keyCol: String, vectorDim: Int): DataFrame = {
    val ones = array(Seq.fill(vectorDim)(lit(1.0f)): _*)
    requests
      .join(snapshot, Seq(keyCol), "left")
      .select(col(keyCol),
        coalesce(nullif(split(col("term_str"), ","), array(lit(""))), array())
          .as("terms"),
        coalesce(
          nullif(split(col("vector_str"), ","), array(lit("")))
            .cast("array<float>"), ones).as("vector"),
        coalesce(
          nullif(split(col("filter_str"), ","), array(lit("")))
            .cast("array<bigint>"), expr("CAST(array() AS ARRAY<BIGINT>)"))
          .as("seen"))
  }

  /** P9 — null-defaulting with the reference's warning count
    * (triton_caller.py:42-53 collects the set of null-filled features):
    * returns the filled frame plus a per-column fill-count report (the
    * warning surface, computed distributed, O(#cols) rows).
    */
  def fillWithReport(df: DataFrame, cols: Seq[String],
                     default: Double): (DataFrame, DataFrame) = {
    val sorted = cols.sorted
    val aggs = sorted.map(c => sum(col(c).isNull.cast("long")).as(c))
    val report = df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${sorted.length}, " +
        sorted.map(c => s"${TextOps.sqlStr(c)}, `$c`").mkString(", ") +
        ") AS (col_name, n_filled)")
    (df.na.fill(default, cols), report)
  }
}
