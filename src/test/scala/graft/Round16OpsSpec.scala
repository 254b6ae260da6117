package graft

import graft.operators.MetricOps

/** Round-16 operator specs: Kendall's W at perfect agreement, the
  * CART split finder on a cleanly separable feature, and Youden's J
  * picking the perfect cut.
  */
class Round16OpsSpec extends SparkSpec {
  import spark.implicits._

  test("kendallW: three identical rankings give W = 1, chi2 = 6; an " +
    "incomplete rater is dropped") {
    val df = (for (r <- 1 to 3; i <- 1 to 3) yield (r, s"i$i", i.toDouble))
      .toDF("r", "i", "v")
      .unionAll(Seq((9, "i1", 5.0)).toDF("r", "i", "v"))
    val out = MetricOps.kendallW(df, "r", "i", "v").collect()(0)
    assert(out.getAs[Long]("m_raters") == 3L)
    assert(out.getAs[Long]("n_items") == 3L)
    assert(out.getAs[Double]("w") == 1.0)
    assert(out.getAs[Double]("chi2") == 6.0)
  }

  test("kendallW: opposite rankings of two raters give W well " +
    "below 1") {
    val df = (Seq((1, "a", 1.0), (1, "b", 2.0), (1, "c", 3.0),
      (2, "a", 3.0), (2, "b", 2.0), (2, "c", 1.0))).toDF("r", "i", "v")
    val out = MetricOps.kendallW(df, "r", "i", "v").collect()(0)
    assert(out.getAs[Double]("w") < 0.5)
  }

  test("bestGiniSplit: a separable feature yields the full root-gini " +
    "gain at the boundary value") {
    val df = (Seq.fill(10)((1.0, 0)) ++ Seq.fill(10)((2.0, 1)))
      .toDF("f", "y")
    val r = MetricOps.bestGiniSplit(df, "f", "y").collect()(0)
    assert(r.getAs[Double]("threshold") == 1.0)
    assert(r.getAs[Double]("gain") == 0.5)
    assert(r.getAs[Long]("n_left") == 10L)
    assert(r.getAs[Long]("pos_left") == 0L)
  }

  test("youdenThreshold: the perfect classifier cut scores J = 1 at " +
    "the positive score") {
    val df = (Seq.fill(10)((0, 1.0)) ++ Seq.fill(10)((1, 2.0)))
      .toDF("y", "s")
    val r = MetricOps.youdenThreshold(df, "y", "s").collect()(0)
    assert(r.getAs[Double]("threshold") == 2.0)
    assert(r.getAs[Double]("j_stat") == 1.0)
    assert(r.getAs[Double]("tpr") == 1.0)
    assert(r.getAs[Double]("fpr") == 0.0)
  }
}
