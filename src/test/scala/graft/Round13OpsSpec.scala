package graft

import org.apache.spark.sql.functions._
import graft.operators.{ExperimentOps, GraphOps, MetricOps}

/** Round-13 operator specs: Greenwood bands on the toy cohort,
  * Granger invariants (nesting + degenerate driver), a hand-computed
  * doubly-robust estimate, Hellinger on identical vs disjoint
  * histograms, CMH on a deterministic stratum, Moran's I = 1 under
  * perfect homophily, info-gain ratio 1 for a label-equal feature,
  * and a Chow break that splits cleanly.
  */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeierCi: Greenwood se and clamped band on the " +
    "4-subject cohort") {
    val df = Seq((1L, 1), (1L, 1), (2L, 0), (2L, 1)).toDF("dur", "ev")
    val r = MetricOps.kaplanMeierCi(df, "dur", "ev").orderBy("t")
      .collect()
    assert(r(0).getAs[Double]("survival") == 0.5)
    assert(r(0).getAs[Double]("se") == 0.25) // S·√(2/(4·2))
    assert(r(0).getAs[Double]("lo") == 0.01)
    assert(r(0).getAs[Double]("hi") == 0.99)
    assert(r(1).getAs[Double]("survival") == 0.25)
    assert(math.abs(r(1).getAs[Double]("se") -
      0.25 * math.sqrt(0.75)) < 1e-6)
    assert(r(1).getAs[Double]("lo") == 0.0) // clamped at 0
  }

  test("grangerCausality: unrestricted RSS never exceeds restricted; " +
    "constant driver nulls the F") {
    val xs = Seq(1L, 3L, 2L, 5L, 4L, 6L, 2L, 8L)
    val ys = Seq(2L, 1L, 4L, 3L, 6L, 5L, 8L, 7L)
    val df = xs.indices.map(i => ("g", i.toLong, ys(i), xs(i)))
      .toDF("g", "t", "y", "x")
    val r = MetricOps.grangerCausality(df, "g", "t", "y", "x")
      .collect()(0)
    assert(r.getAs[Long]("n") == 7L)
    assert(r.getAs[Double]("rss_unrestricted") <=
      r.getAs[Double]("rss_restricted") + 1e-9)
    assert(r.getAs[Double]("granger_f") >= 0.0)
    val const = xs.indices.map(i => ("g", i.toLong, ys(i), 5L))
      .toDF("g", "t", "y", "x")
    val r0 = MetricOps.grangerCausality(const, "g", "t", "y", "x")
      .collect()(0)
    assert(r0.isNullAt(r0.fieldIndex("granger_f")))
  }

  test("doublyRobust: hand case gives DM 1, IPS 0.5, DR 0.5") {
    val df = Seq(("a", 1.0, 0), ("a", 1.0, 0), ("b", 0.0, 0),
      ("a", 1.0, 1), ("a", 0.0, 1), ("b", 1.0, 1))
      .toDF("act", "r", "sp")
    val out = ExperimentOps.doublyRobust(df, "act", "r", "sp",
      targetAction = "a", clipAt = 10.0).collect()(0)
    assert(out.getAs[Long]("n_eval") == 3L)
    assert(out.getAs[Double]("direct_method") == 1.0)
    assert(out.getAs[Double]("ips_clipped") == 0.5)
    assert(out.getAs[Double]("dr") == 0.5)
  }

  test("hellingerDrift: identical histograms give H 0, disjoint " +
    "give H 1") {
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("s", "v")
    val r0 = MetricOps.hellingerDrift(same, "s", "v", "a", "b")
      .collect()(0)
    assert(r0.getAs[Double]("bc") == 1.0)
    assert(r0.getAs[Double]("hellinger") == 0.0)
    assert(r0.getAs[Double]("bhattacharyya") == 0.0)
    val disj = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("s", "v")
    val r1 = MetricOps.hellingerDrift(disj, "s", "v", "a", "b")
      .collect()(0)
    assert(r1.getAs[Double]("hellinger") == 1.0)
    assert(r1.isNullAt(r1.fieldIndex("bhattacharyya")))
  }

  test("cmhTest: one deterministic stratum gives chi2 19 and an " +
    "infinite (null) OR") {
    val rows = Seq.fill(10)((("s1"), 1, 1)) ++ Seq.fill(10)((("s1"), 0, 0))
    val df = rows.toDF("st", "x", "y")
    val r = MetricOps.cmhTest(df, "st", "x", "y").collect()(0)
    assert(r.getAs[Long]("k_strata") == 1L)
    assert(math.abs(r.getAs[Double]("cmh_chi2") - 19.0) < 1e-6)
    assert(r.isNullAt(r.fieldIndex("or_mh"))) // b·c = 0 denominator
  }

  test("moransI: two homophilous cliques give I = 1") {
    val nodes = Seq((1L, 1.0), (2L, 1.0), (3L, 3.0), (4L, 3.0))
      .toDF("id", "x")
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst")
    val r = GraphOps.moransI(nodes, "id", "x", edges, "src", "dst")
      .collect()(0)
    assert(r.getAs[Long]("n_nodes") == 4L)
    assert(r.getAs[Long]("n_edges") == 4L)
    assert(r.getAs[Double]("morans_i") == 1.0)
  }

  test("featureInfoGain: label-equal feature scores ratio 1, constant " +
    "feature nulls the ratio") {
    val df = (0 until 40).map(i => (i % 2, i % 2, 7))
      .toDF("y", "same", "const")
    val r = MetricOps.featureInfoGain(df, "y", Seq("same", "const"))
      .orderBy("feature").collect()
    val c = r.find(_.getAs[String]("feature") == "const").get
    assert(c.getAs[Double]("mi_nats") == 0.0)
    assert(c.isNullAt(c.fieldIndex("ig_ratio")))
    val s = r.find(_.getAs[String]("feature") == "same").get
    assert(math.abs(s.getAs[Double]("mi_nats") - math.log(2)) < 1e-6)
    assert(s.getAs[Double]("ig_ratio") == 1.0)
  }

  test("chowTest: a level shift at the break explodes the pooled RSS") {
    val rows = (0L until 10L).map(x => ("g", x, x + x % 2)) ++
      (10L until 20L).map(x => ("g", x, x + 100 + x % 2))
    val df = rows.toDF("g", "x", "y")
    val r = MetricOps.chowTest(df, "g", "x", "y", breakX = 10L)
      .collect()(0)
    assert(r.getAs[Long]("n1") == 10L && r.getAs[Long]("n2") == 10L)
    assert(r.getAs[Double]("rss_pooled") > r.getAs[Double]("rss_split"))
    assert(r.getAs[Double]("chow_f") > 100.0)
  }
}
