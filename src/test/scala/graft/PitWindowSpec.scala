package graft

import org.apache.spark.sql.functions._
import graft.operators.RelationalOps

/** W2/W3 boundary semantics (SURVEY §5.2 / §7.5.1): the impression frame
  * covers the previous ≤10 rows, the user snapshot the last ≤11 rows —
  * the faithful off-by-one of the reference dequeue
  * (s2_term_trans.py:42-61). Tested at exactly 10, 11, and 12 events.
  */
class PitWindowSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents(n: Int, user: Long = 1L) =
    (0 until n).map(i => (user, i.toLong, i.toLong * 1000, if (i % 2 == 0) 1 else 0))
      .toDF("user_id", "event_id", "ts", "label")

  private val order = Seq(col("ts"), col("event_id"))

  test("W2: first row sees an empty frame (imp_dict[0] = {})") {
    val out = RelationalOps.pitWindow(mkEvents(5), "user_id", order, "label", 10)
      .orderBy("event_id").select("pit_imp", "pit_clk").as[(Long, Long)].collect()
    assert(out.head == ((0L, 0L)))   // strictly-before: no leakage of row 0
    assert(out(1) == ((1L, 1L)))     // row 1 sees only row 0 (label 1)
  }

  test("W2: frame is capped at 10 previous rows") {
    for (n <- Seq(10, 11, 12)) {
      val out = RelationalOps.pitWindow(mkEvents(n), "user_id", order, "label", 10)
        .orderBy("event_id").select("pit_imp").as[Long].collect()
      assert(out.last == math.min(n - 1, 10),
        s"n=$n: last row must see min(n-1, 10) predecessors")
    }
  }

  test("W2: current row is excluded (PIT no-leakage)") {
    val out = RelationalOps.pitWindow(mkEvents(12), "user_id", order, "label", 10)
      .orderBy("event_id").select("pit_clk").as[Long].collect()
    // row 11 (label 0): frame = rows 1..10, labels 0,1,0,1,... (5 ones)
    assert(out(11) == 5L)
  }

  test("W3: snapshot covers ≤11 rows (one more than W2 — the flush adds the final row)") {
    for ((n, want) <- Seq(10 -> 10L, 11 -> 11L, 12 -> 11L)) {
      val out = RelationalOps.userSnapshot(mkEvents(n), "user_id", order, "label", 10)
        .select("snap_imp").as[Long].collect()
      assert(out.length == 1, "snapshot is evaluated only at the user's last row")
      assert(out.head == want, s"n=$n: snapshot must cover min(n, 11) rows")
    }
  }

  test("W2: tie on ts is broken deterministically by event_id") {
    val df = Seq(
      (1L, 10L, 100L, 1), (1L, 11L, 100L, 0), (1L, 12L, 100L, 1)
    ).toDF("user_id", "event_id", "ts", "label")
    val out = RelationalOps.pitWindow(df, "user_id", order, "label", 10)
      .orderBy("event_id").select("pit_imp", "pit_clk").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 0L), (1L, 1L), (2L, 1L)))
  }

  test("W4: three-way split tiles the input and holds out the last 10 per user") {
    val df = mkEvents(50)
    val rn = RelationalOps.rowNumber(df, "user_id", order)
      .withColumn("u_cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
    val split = RelationalOps.threeWaySplit(rn, "rn", "u_cnt", 10, 0.2)
    val byCode = split.groupBy("istest").count().as[(Int, Long)].collect().toMap
    assert(byCode.values.sum == 50)
    assert(byCode(2) == 10)            // last-10 holdout
    assert(byCode(0) == 32)            // floor-free: rn < 40*0.8 = 32 rows
    assert(byCode(1) == 8)
  }
}
