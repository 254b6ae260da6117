package graft

import graft.operators.AsOfJoin

/** General as-of join semantics: inclusive ≤ match, newest-right wins,
  * no-match left rows survive with null payload, right ties resolved
  * by the tiebreak column.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val left = Seq(
    (1L, 5L, 100L),    // before any right row → null
    (1L, 10L, 101L),   // exactly at right ts 10 → inclusive match
    (1L, 25L, 102L),   // between 20 and 30 → matches 20
    (2L, 50L, 103L))   // other key
    .toDF("k", "ts", "left_id")

  private lazy val right = Seq(
    (1L, 10L, 1.0, 1L), (1L, 20L, 2.0, 2L), (1L, 30L, 3.0, 3L),
    (2L, 50L, 9.0, 4L))
    .toDF("k", "ts", "v", "rid")

  test("as-of join: inclusive, most-recent, null before first") {
    val out = AsOfJoin(left, right, "k", "ts", "ts", Seq("v"), "rid")
      .orderBy("left_id")
      .select("left_id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(out.toSeq == Seq(
      100L -> None, 101L -> Some(1.0), 102L -> Some(2.0), 103L -> Some(9.0)))
  }

  test("right rows tied on (key, ts): the larger tiebreak wins") {
    val dupRight = Seq((1L, 10L, 7.0, 9L)).toDF("k", "ts", "v", "rid")
      .unionAll(right)
    val out = AsOfJoin(left.filter($"left_id" === 101L), dupRight,
        "k", "ts", "ts", Seq("v"), "rid")
      .select("v").as[Double].head()
    assert(out == 7.0)   // rid 9 > rid 1 at ts 10
  }

  test("all left columns survive the join") {
    val out = AsOfJoin(left, right, "k", "ts", "ts", Seq("v"), "rid")
    assert(out.columns.toSet == Set("k", "ts", "left_id", "v"))
    assert(out.count() == 4)
  }
}
