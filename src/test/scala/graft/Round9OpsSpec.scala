package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, ExperimentOps, GraphOps, JoinOps,
  MetricOps, QualityChecks, RelationalOps, SamplingOps}

/** Round-9 operator specs: survivorship tie-break rules, incremental
  * join ≡ full recompute, UCB1 against the hand formula, and Kendall
  * τ-b against hand-counted concordances (with and without ties).
  */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  // --------------------------------------------------------- survivorship

  test("survivorship: canonical by (size desc, id asc), mode ties to min") {
    val df = Seq(
      // cluster 1: sizes 10,10,3 → canonical = id 1 (size tie → min id);
      // langs en,en,de → mode en
      (1L, 1L, 10L, "en"), (1L, 2L, 10L, "en"), (1L, 3L, 3L, "de"),
      // cluster 2: lang tie de/fr 1-1 → min lang de; canonical id 5
      (2L, 5L, 7L, "fr"), (2L, 4L, 2L, "de"))
      .toDF("cluster", "id", "sz", "lang")
    val out = DedupOps.survivorship(df, "cluster", "id", "sz", "lang")
      .orderBy("cluster_id").collect()
    assert(out.length == 2)
    val c1 = out(0)
    assert(c1.getLong(1) == 3 && c1.getLong(2) == 23)
    assert(c1.getLong(3) == 1L && c1.getLong(4) == 10L)
    assert(c1.getString(5) == "en")
    val c2 = out(1)
    assert(c2.getLong(3) == 5L && c2.getString(5) == "de")
  }

  test("survivorship: singleton cluster is its own canonical") {
    val df = Seq((9L, 42L, 5L, "it")).toDF("cluster", "id", "sz", "lang")
    val r = DedupOps.survivorship(df, "cluster", "id", "sz", "lang")
      .collect()(0)
    assert(r.getLong(1) == 1 && r.getLong(3) == 42L &&
      r.getString(5) == "it")
  }

  // ------------------------------------------------------ incrementalJoin

  test("incrementalJoin: base + deltas equals full recompute") {
    val a = Seq((1L, "a1"), (2L, "a2"), (3L, "a3"), (3L, "a3b"))
      .toDF("k", "va")
    val b = Seq((1L, "b1"), (2L, "b2"), (2L, "b2b"), (4L, "b4"))
      .toDF("k", "vb")
    // split each side arbitrarily into base/delta
    val (a0, da) = (a.filter(col("va") < "a3"), a.filter(col("va") >= "a3"))
    val (b0, db) = (b.filter(col("vb") =!= "b2b"), b.filter(col("vb") === "b2b"))
    val inc = JoinOps.incrementalJoin(
      a0.join(b0, Seq("k")), a0, da, b0, db, Seq("k"))
    val full = a.join(b, Seq("k"))
    assert(inc.count() == full.count())
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty)
  }

  test("incrementalJoin: empty deltas reproduce the base join exactly") {
    val a = Seq((1L, "x")).toDF("k", "va")
    val b = Seq((1L, "y")).toDF("k", "vb")
    val empty = (va: String) => a.filter(col("va") === "never")
    val inc = JoinOps.incrementalJoin(a.join(b, Seq("k")),
      a, a.limit(0), b, b.limit(0), Seq("k"))
    assert(inc.count() == 1)
  }

  // ----------------------------------------------------------------- ucb1

  test("ucb1: hand formula on two arms") {
    val df = Seq(("a", 1.0), ("a", 0.0), ("b", 1.0), ("b", 1.0))
      .toDF("arm", "r")
    val out = ExperimentOps.ucb1(df, "arm", "r")
      .orderBy("arm").collect()
    val bonus = math.sqrt(2 * math.log(4.0) / 2)
    assert(out(0).getLong(1) == 2)
    assert(math.abs(out(0).getDouble(2) - 0.5) < 1e-6)
    assert(math.abs(out(0).getDouble(3) - bonus) < 1e-6)
    assert(math.abs(out(0).getDouble(4) - (0.5 + bonus)) < 1e-6)
    assert(math.abs(out(1).getDouble(4) - (1.0 + bonus)) < 1e-6)
  }

  // ------------------------------------------------------------ kendallTau

  test("kendallTau: perfect agreement and perfect inversion") {
    val up = (1 to 5).map(i => ("up", i.toDouble, i.toDouble))
    val dn = (1 to 5).map(i => ("dn", i.toDouble, (6 - i).toDouble))
    val out = MetricOps.kendallTau((up ++ dn).toDF("g", "x", "y"),
      "g", "x", "y").orderBy("g").collect()
    // dn: all 10 pairs discordant → τ = −1
    assert(out(0).getLong(2) == 0 && out(0).getLong(3) == 10)
    assert(math.abs(out(0).getDouble(4) + 1.0) < 1e-6)
    // up: all 10 pairs concordant → τ = +1
    assert(out(1).getLong(2) == 10 && out(1).getLong(3) == 0)
    assert(math.abs(out(1).getDouble(4) - 1.0) < 1e-6)
  }

  test("kendallTau: tie correction matches the hand-computed τ-b") {
    // x: 1,1,2,3  y: 1,2,2,3 → n0=6, n1(x ties)=1, n2(y ties)=1
    // pairs with x strictly <: (1,2)x{...}: C = pairs (x<x', y<y'):
    //   (1,1)-(2,2):C (1,1)-(3,3):C (1,2)-(2,2):tie-y (1,2)-(3,3):C
    //   (2,2)-(3,3):C → C=4, D=0 → τb = 4/√(5·5) = 0.8
    val df = Seq(("g", 1.0, 1.0), ("g", 1.0, 2.0), ("g", 2.0, 2.0),
      ("g", 3.0, 3.0)).toDF("g", "x", "y")
    val r = MetricOps.kendallTau(df, "g", "x", "y").collect()(0)
    assert(r.getLong(1) == 4)
    assert(r.getLong(2) == 4 && r.getLong(3) == 0)
    assert(math.abs(r.getDouble(4) - 0.8) < 1e-6)
  }

  test("kendallTau: all-tied x yields null τ (zero denominator)") {
    val df = Seq(("g", 1.0, 1.0), ("g", 1.0, 2.0)).toDF("g", "x", "y")
    val r = MetricOps.kendallTau(df, "g", "x", "y").collect()(0)
    assert(r.isNullAt(4) && r.getLong(2) == 0 && r.getLong(3) == 0)
  }

  // ----------------------------------------------------- intervalCoverage

  test("intervalCoverage: overlap merges, touch merges, gap splits") {
    // key u: [0,10) [5,15) overlap → one segment [0,15); [15,25) touches
    // → still one segment [0,25); [100,110) separate → 2 segments, 35 s
    val df = Seq((1L, 0L, 1L), (1L, 5L, 2L), (1L, 15L, 3L), (1L, 100L, 4L))
      .toDF("u", "sec", "id")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val r = RelationalOps.intervalCoverage(df, "u", "ts", "id", 10L)
      .collect()(0)
    assert(r.getLong(1) == 4 && r.getLong(2) == 2 && r.getLong(3) == 35L)
  }

  test("intervalCoverage: fully nested intervals count once") {
    val df = Seq((1L, 0L, 1L), (1L, 2L, 2L)).toDF("u", "sec", "id")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val r = RelationalOps.intervalCoverage(df, "u", "ts", "id", 100L)
      .collect()(0)
    assert(r.getLong(2) == 1 && r.getLong(3) == 102L)
  }

  // ----------------------------------------------------------- adamicAdar

  test("adamicAdar: square graph scores the two diagonals") {
    // cycle a-b-c-d-a: unlinked pairs (a,c) and (b,d), each with two
    // degree-2 common neighbors → score = 2/ln(2)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("s", "t")
    val out = GraphOps.adamicAdar(edges, "s", "t", topK = 10)
      .orderBy("u", "v").collect()
    assert(out.length == 2)
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 3L), (2L, 4L)))
    out.foreach { r =>
      assert(r.getLong(2) == 2)
      assert(math.abs(r.getDouble(3) - 2.0 / math.log(2.0)) < 1e-5)
    }
  }

  test("adamicAdar: hub centers above maxDegree are excluded") {
    // star center 0 with 5 leaves; maxDegree=4 excludes it → no pairs
    val edges = (1L to 5L).map(i => (0L, i)).toDF("s", "t")
    assert(GraphOps.adamicAdar(edges, "s", "t", 10, maxDegree = 4)
      .isEmpty)
    // with the cap lifted the 10 leaf pairs score 1/ln(5)
    val out = GraphOps.adamicAdar(edges, "s", "t", 20, maxDegree = 10)
      .collect()
    assert(out.length == 10)
    assert(math.abs(out.head.getDouble(3) - 1 / math.log(5.0)) < 1e-5)
  }

  // --------------------------------------------------------- durbinWatson

  test("durbinWatson: perfect linear fit yields null (zero residuals)") {
    val df = (1L to 10L).map(t => ("g", t, 2 * t + 3)).toDF("g", "x", "y")
    val r = MetricOps.durbinWatson(df, "g", "x", "y").collect()(0)
    assert(r.isNullAt(3))
    assert(math.abs(r.getDouble(2) - 2.0) < 1e-6)
  }

  test("durbinWatson: alternating residuals land near 4, trend near 0") {
    // y alternates ±1 → strongly negative serial correlation (DW → 4);
    // expected value computed by direct OLS+DW replication
    val xs = (0L until 10L).toArray
    val ys = xs.map(t => if (t % 2 == 0) 1.0 else -1.0)
    val n = xs.length
    val (sx, sy) = (xs.sum.toDouble, ys.sum)
    val sxx = xs.map(x => x.toDouble * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val a = (sy - b * sx) / n
    val e = xs.zip(ys).map { case (x, y) =>
      BigDecimal(y - a - b * x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    val num = e.sliding(2).map { case Array(p, c) => (c - p) * (c - p) }.sum
    val den = e.map(v => v * v).sum
    val expect = num / den
    assert(expect > 3.0) // sanity: strongly negative autocorrelation
    val df = xs.zip(ys).map { case (x, y) => ("g", x, y.toLong) }
      .toSeq.toDF("g", "x", "y")
    val r = MetricOps.durbinWatson(df, "g", "x", "y").collect()(0)
    assert(math.abs(r.getDouble(3) - expect) < 1e-4)
  }

  // ----------------------------------------------------- crossCorrelation

  test("crossCorrelation: a leading b by 2 peaks at lag +2") {
    // b_t = a_{t-2}: a happens first → positive-lag convention
    val a = (1L to 30L).map(t => (t, math.sin(t * 0.7) * 10))
    val df = a.map { case (t, v) =>
      (t, v, a.find(_._1 == t - 2).map(_._2).getOrElse(0.0))
    }.toDF("x", "a", "b")
    val ccf = MetricOps.crossCorrelation(df.filter(col("x") > 2),
        "x", "a", "b", maxLag = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(ccf(2L) - 1.0) < 1e-6)
    assert(ccf(0L) < 0.9 && ccf(-2L) < 0.9)
  }

  // --------------------------------------------------------- calendarGaps

  test("calendarGaps: missing days counted, first gap reported") {
    val df = Seq(0, 1, 3, 5).map(day =>
      ("g", java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(1970, 1, 1 + day, 12, 0))))
      .toDF("g", "ts")
    val r = QualityChecks.calendarGaps(df, "g", "ts").collect()(0)
    assert(r.getLong(1) == 6 && r.getLong(2) == 4 && r.getLong(3) == 2)
    assert(r.getString(4) == "1970-01-03")
  }

  test("calendarGaps: complete calendar reports zero missing, null first") {
    val df = (0 to 4).map(day =>
      ("g", java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(1970, 1, 1 + day, 3, 0))))
      .toDF("g", "ts")
    val r = QualityChecks.calendarGaps(df, "g", "ts").collect()(0)
    assert(r.getLong(3) == 0 && r.isNullAt(4))
  }

  // ----------------------------------------------------- percentileBands

  test("percentileBands: lower inverse-CDF picks on a known histogram") {
    // 10 values 1..10 → p10 = 1 (cum 1 ≥ 1), p50 = 5, p90 = 9
    val df = (1 to 10).map(v => ("g", 0L, v.toDouble)).toDF("g", "wk", "v")
    val r = MetricOps.percentileBands(df, Seq("g", "wk"), "v")
      .collect()(0)
    assert(r.getLong(2) == 10)
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 5.0 &&
      r.getDouble(5) == 9.0)
  }

  // ------------------------------------------------------------- ljungBox

  test("ljungBox: constant series → zero rhos and Q; ramp → strong lag-1") {
    val flat = (1L to 20L).map(x => ("g", x, 7L)).toDF("g", "x", "y")
    val f = MetricOps.ljungBox(flat, "g", "x", "y", m = 3).collect()
    assert(f.length == 3)
    assert(f.forall(r => r.getDouble(2) == 0.0 && r.getDouble(4) == 0.0))
    val ramp = (1L to 40L).map(x => ("g", x, x)).toDF("g", "x", "y")
    val out = MetricOps.ljungBox(ramp, "g", "x", "y", m = 3)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(out(1L) > 0.8 && out(1L) > out(3L))
  }

  // ---------------------------------------------------------- fisherExact

  test("fisherExact: lady-tasting-tea tail probabilities") {
    // n=8, r1=c1=4: P[X ≥ 4] = 1/70; with one miss P[X ≥ 3] = 17/70
    def table(a11: Int) = {
      val rows = for {
        i <- 0 until 8
        a = if (i < 4) 1 else 0
        b = if (a == 1) (if (i < a11) 1 else 0)
            else (if (i - 4 < 4 - a11) 1 else 0)
      } yield ("g", a, b)
      rows.toDF("g", "a", "b")
    }
    val p4 = MetricOps.fisherExact(table(4), "g", "a", "b")
      .collect()(0).getDouble(6)
    assert(math.abs(p4 - 1.0 / 70) < 1e-6)
    val p3 = MetricOps.fisherExact(table(3), "g", "a", "b")
      .collect()(0).getDouble(6)
    assert(math.abs(p3 - 17.0 / 70) < 1e-6)
  }

  // ---------------------------------------------------------- ewmaAnomaly

  test("ewmaAnomaly: constant series raises nothing; spike is flagged") {
    val flat = (1L to 20L).map(x => ("g", x, 10L)).toDF("g", "x", "y")
    assert(MetricOps.ewmaAnomaly(flat, "g", "x", "y", win = 4).isEmpty)
    val spike = (1L to 20L)
      .map(x => ("g", x, if (x == 15L) 100L else 10L))
      .toDF("g", "x", "y")
    val out = MetricOps.ewmaAnomaly(spike, "g", "x", "y", win = 4,
      zCut = 2.0).collect()
    assert(out.map(_.getLong(1)).contains(15L))
  }

  test("ewmaAnomaly: short history normalizes by present weights") {
    // row 2 has ONE predecessor (y=4) → ewma_prev = 4 exactly
    val df = Seq(("g", 1L, 4L), ("g", 2L, 8L), ("g", 3L, 4L),
      ("g", 4L, 4L)).toDF("g", "x", "y")
    val ew = MetricOps.ewmaAnomaly(df, "g", "x", "y", win = 2,
        zCut = 0.0)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(math.abs(ew(2L) - 4.0) < 1e-9)
    // row 3: weights 2·y₂ + 1·y₁ over 3 → (16+4)/3
    assert(math.abs(ew(3L) - 20.0 / 3) < 1e-6)
  }

  // ------------------------------------------------------------- friedman

  test("friedman: consistent ordering across blocks, hand χ²") {
    // k=3 treatments, b=2 blocks, same order in both → R=(2,4,6),
    // χ² = 12/(2·3·4)·56 − 3·2·4 = 4
    val df = Seq(("b1", "t1", 1.0), ("b1", "t2", 2.0), ("b1", "t3", 3.0),
      ("b2", "t1", 1.5), ("b2", "t2", 2.5), ("b2", "t3", 3.5))
      .toDF("blk", "trt", "v")
    val out = MetricOps.friedman(df, "blk", "trt", "v")
      .orderBy("trt").collect()
    assert(out.length == 3)
    assert(out.map(_.getDouble(2)).toSeq == Seq(2.0, 4.0, 6.0))
    assert(out.forall(r => math.abs(r.getDouble(5) - 4.0) < 1e-9))
    assert(out.forall(r => r.getLong(1) == 2 && r.getLong(4) == 3))
  }

  test("friedman: incomplete blocks are dropped; ties average") {
    val df = Seq(
      ("b1", "t1", 1.0), ("b1", "t2", 1.0), // tie → ranks 1.5/1.5
      ("b2", "t1", 2.0), ("b2", "t2", 1.0),
      ("b3", "t1", 9.9)) // incomplete → dropped
      .toDF("blk", "trt", "v")
    val out = MetricOps.friedman(df, "blk", "trt", "v")
      .orderBy("trt").collect()
    assert(out.forall(_.getLong(1) == 2)) // b3 gone
    // t1: 1.5 + 2 = 3.5 ; t2: 1.5 + 1 = 2.5
    assert(out.map(_.getDouble(2)).toSeq == Seq(3.5, 2.5))
  }

  // ----------------------------------------------------- systematicSample

  test("systematicSample: exact stride, offsets partition the table") {
    val df = (1L to 100L).map(k => (k, s"v$k")).toDF("k", "v")
    val s0 = SamplingOps.systematicSample(df, "k", 10)
    assert(s0.count() == 10)
    val ranks = s0.select("sample_rank").collect().map(_.getLong(0)).sorted
    assert(ranks.toSeq == (0 until 10).map(i => i * 10L + 1))
    // offsets 0..9 partition the table exactly
    val total = (0 until 10)
      .map(o => SamplingOps.systematicSample(df, "k", 10, o).count()).sum
    assert(total == 100)
    // deterministic across reruns
    val again = SamplingOps.systematicSample(df, "k", 10)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(again == s0.select("k").collect().map(_.getLong(0)).toSet)
  }

  // ------------------------------------------------- theilDecomposition

  test("theilDecomposition: equality → 0; pure between-group case") {
    val eq = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L))
      .toDF("g", "x")
    val r0 = MetricOps.theilDecomposition(eq, "g", "x").collect()
    assert(r0.forall(r => math.abs(r.getDouble(7)) < 1e-9))
    // within-constant groups: a=10,10; b=30,30 → T_within=0,
    // T_between = .25·ln(.5) + .75·ln(1.5)
    val df = Seq(("a", 10L), ("a", 10L), ("b", 30L), ("b", 30L))
      .toDF("g", "x")
    val r = MetricOps.theilDecomposition(df, "g", "x").collect()(0)
    val expect = 0.25 * math.log(0.5) + 0.75 * math.log(1.5)
    assert(math.abs(r.getDouble(5)) < 1e-9) // t_within
    assert(math.abs(r.getDouble(6) - expect) < 1e-6) // t_between
    assert(math.abs(r.getDouble(7) - expect) < 1e-6) // t_total
  }

  test("fisherExact: independent margins give p near the expected mass") {
    // certain containment: a11 = min(r1,c1) → single term; p ≤ 1
    val df = Seq(("g", 1, 1), ("g", 1, 1), ("g", 0, 0), ("g", 0, 0))
      .toDF("g", "a", "b")
    val r = MetricOps.fisherExact(df, "g", "a", "b").collect()(0)
    assert(r.getLong(4) == 2)
    // P[X ≥ 2] with n=4, r1=c1=2 → C(2,2)/C(4,2) = 1/6
    assert(math.abs(r.getDouble(6) - 1.0 / 6) < 1e-6)
  }
}
