package graft

import graft.operators.MetricOps

/** Round-17 operator specs: HHI on hand shares and the QQ decile
  * table under a pure location shift.
  */
class Round17OpsSpec extends SparkSpec {
  import spark.implicits._

  test("herfindahl: 90/10 duopoly scores 0.82, monopoly nulls the " +
    "normalized form") {
    val df = Seq(("d", "e1", 90.0), ("d", "e2", 10.0),
      ("m", "only", 50.0)).toDF("g", "e", "v")
    val r = MetricOps.herfindahl(df, "g", "e", "v").orderBy("g")
      .collect()
    val duo = r(0)
    assert(duo.getAs[Double]("hhi") == 0.82)
    assert(duo.getAs[Double]("hhi_normalized") == 0.64)
    val mono = r(1)
    assert(mono.getAs[Double]("hhi") == 1.0)
    assert(mono.isNullAt(mono.fieldIndex("hhi_normalized")))
  }

  test("qqTable: a pure +5 shift shows a constant gap at every decile") {
    val a = (0 to 10).map(v => ("a", v.toDouble))
    val b = (0 to 10).map(v => ("b", v + 5.0))
    val r = MetricOps.qqTable((a ++ b).toDF("s", "v"), "s", "v", "a", "b")
      .orderBy("quantile").collect()
    assert(r.length == 9)
    assert(r.map(_.getAs[Double]("gap")).forall(_ == 5.0))
    assert(r(4).getAs[Double]("q_a") == 5.0) // median of 0..10
  }
}
