package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.RelationalOps
import graft.tables.Tables

/** Flagship batch-recommendation query (SURVEY §7.1): the reference's
  * online path (§3.3) collapsed into one lazy Spark plan —
  * scan → PIT behavior window → candidate join → hybrid score → top-k.
  *
  * Structure mirrors online recall/rank
  * (online/utils/es_caller.py:56-58 hybrid 0.1/0.9 boosts;
  * online/utils/triton_caller.py:75-76 sort+cut), with the W2 PIT frame
  * of offline/preprocess/s2_term_trans.py:42-61 providing the user
  * behavior features.
  *
  * Scale: the only wide exchanges are (a) the user-key shuffle for the
  * PIT window (bounded ≤10-row frames) and (b) the per-user top-k window;
  * the candidate "dimension" (per-item global stats) is broadcast.
  */
object Flagship {

  def recommend(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("label", when(col("value") > 100, 1).otherwise(0))

    // W1: per-user event index (deterministic tiebreak on event_id).
    val rn = RelationalOps.rowNumber(ev, "user_id", Seq(col("ts"), col("event_id")))

    // W2 (faithful rn-RANGE form, SURVEY §7.5.2): per (user, item) clicks
    // within the user's previous ≤10 *events* — the frame is defined over
    // the impression index rn, not over per-item rows, so a RANGE frame on
    // rn after keying by (user, item) counts exactly the reference's
    // dequeue semantics.
    val wPit = Window.partitionBy("user_id", "event_type")
      .orderBy(col("rn")).rangeBetween(-10, -1)
    val behavior = rn
      .withColumn("pit_clk", coalesce(sum(col("label")).over(wPit), lit(0L)))
      .withColumn("pit_imp", count(lit(1)).over(wPit))

    // Per-user state snapshot: last row per (user, item) carries the most
    // recent PIT counters — the serving-snapshot analogue (S7).
    val lastPerUserItem = Window.partitionBy("user_id", "event_type")
      .orderBy(col("rn").desc)
    val userState = behavior
      .withColumn("__r", row_number().over(lastPerUserItem))
      .filter(col("__r") === 1)
      .select(col("user_id"), col("event_type"),
        col("pit_clk"), col("pit_imp"))

    // Candidate channel A (popularity, boost 0.1): global item CTR.
    val pop = ev.groupBy("event_type")
      .agg((sum(col("label")) / count(lit(1))).as("pop_rate"))

    // Candidate channel B (personal, boost 0.9): user PIT click rate.
    val users = ev.select("user_id").distinct()
    val items = ev.select("event_type").distinct()
    val cands = users.crossJoin(broadcast(items))
      .join(userState, Seq("user_id", "event_type"), "left")
      .join(broadcast(pop), Seq("event_type"), "left")
      .withColumn("score",
        lit(0.1) * coalesce(col("pop_rate"), lit(0.0)) +
          lit(0.9) * coalesce(col("pit_clk") /
            when(col("pit_imp") > 0, col("pit_imp")), lit(0.0)))

    // O2/O3: top-3 per user, deterministic tiebreak.
    RelationalOps.topKPerGroup(cands, "user_id",
        Seq(col("score").desc, col("event_type")), 3)
      .select(col("user_id"), col("event_type").as("item"),
        round(col("score"), 6).as("score"))
      .orderBy(col("user_id"), col("score").desc, col("item"))
  }
}
