package graft

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.RelationalOps

/** SURVEY §5.2 properties over seeded random inputs:
  *  (a) PIT no-leakage — features at row i are invariant under ANY
  *      mutation of rows ≥ i;
  *  (b) split tiling — the three istest codes partition every user's
  *      rows with the last-min(n,10) holdout;
  *  (c) z-score — train mean → 0, stddev_samp → 1 for non-constant
  *      columns;
  *  (d) hybrid — union score equals the sum of per-channel scores.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomEvents(seed: Int): Seq[(Long, Long, Long, Int)] = {
    val r = new Random(seed)
    for {
      u <- 0L until 5L
      n = 1 + r.nextInt(30)
      i <- 0 until n
    } yield (u, u * 1000 + i, i.toLong * 7, r.nextInt(2))
  }

  test("(a) PIT no-leakage: mutating the future never changes past features") {
    for (seed <- 1 to 5) {
      val base = randomEvents(seed)
      val cut = new Random(seed).nextInt(15).toLong
      // flip every label at rn >= cut (the "future" relative to cut)
      val byUser = base.groupBy(_._1).values.flatMap { rows =>
        rows.sortBy(_._3).zipWithIndex.map { case ((u, id, ts, l), rn) =>
          (u, id, ts, if (rn >= cut) 1 - l else l, rn.toLong)
        }
      }.toSeq
      val origDf = byUser.map { case (u, id, ts, _, rn) =>
        (u, id, ts, base.find(_._2 == id).get._4, rn)
      }.toDF("user_id", "event_id", "ts", "label", "rn")
      val mutDf = byUser.toDF("user_id", "event_id", "ts", "label", "rn")

      def feats(df: org.apache.spark.sql.DataFrame) =
        RelationalOps.pitWindow(df, "user_id", Seq(col("ts"), col("event_id")),
            "label", 10)
          .filter(col("rn") <= cut)
          .select("event_id", "pit_imp", "pit_clk")
          .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

      assert(feats(origDf) == feats(mutDf), s"leakage at seed=$seed cut=$cut")
    }
  }

  test("(b) split tiling: codes partition each user, holdout = min(n, 10)") {
    for (seed <- 1 to 5) {
      val data = randomEvents(seed).map { case (u, id, ts, l) => (u, id, ts, l) }
        .toDF("user_id", "event_id", "ts", "label")
      val rn = RelationalOps.rowNumber(data, "user_id", Seq(col("ts"), col("event_id")))
        .withColumn("u_cnt", count(lit(1)).over(Window.partitionBy("user_id")))
      val split = RelationalOps.threeWaySplit(rn, "rn", "u_cnt", 10, 0.2)
      val perUser = split.groupBy("user_id", "istest").count()
        .as[(Long, Int, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
      val sizes = split.groupBy("user_id").count().as[(Long, Long)].collect().toMap
      sizes.foreach { case (u, n) =>
        val m = perUser(u)
        assert(m.values.sum == n, s"user $u codes don't tile")
        assert(m.getOrElse(2, 0L) == math.min(n, 10), s"user $u holdout wrong")
        val expTrain = (0L until n).count(r => r < (n - 10) * 0.8)
        assert(m.getOrElse(0, 0L) == expTrain, s"user $u train wrong")
      }
    }
  }

  test("(c) z-score: train statistics normalize to mean 0, stddev_samp 1") {
    for (seed <- 1 to 3) {
      val r = new Random(seed)
      val xs = Seq.fill(200)(r.nextDouble() * 100 - 50).toDF("x")
      val z = RelationalOps.zscore(xs, xs, "x", "z", roundTo = 10)
      val (m, s) = z.agg(avg("z"), stddev_samp("z")).as[(Double, Double)].head()
      assert(math.abs(m) < 1e-6, s"mean $m")
      assert(math.abs(s - 1.0) < 1e-6, s"std $s")
    }
  }

  test("(e) as-of exec ≡ window form on seeded random frames") {
    import graft.operators.AsOfJoin
    for (seed <- 1 to 3) {
      val r = new Random(seed)
      val left = (0 until 200).map(i =>
        (r.nextInt(8).toLong, r.nextInt(100).toLong, i.toLong))
        .toDF("k", "lts", "lid")
      val right = (0 until 80).map(i =>
        (r.nextInt(8).toLong, r.nextInt(100).toLong, i / 10.0))
        .distinct.groupBy(t => (t._1, t._2)).values.map(_.head).toSeq
        .toDF("k", "rts", "px")
      val ex = AsOfJoin.exec(left, right, Seq("k"), "lts", "rts", "left")
        .select(left("lid"), col("px"))
        .as[(Long, Option[Double])].collect().toMap
      val win = AsOfJoin(left, right, "k", "lts", "rts", Seq("px"), "rts")
        .select(col("lid"), col("px"))
        .as[(Long, Option[Double])].collect().toMap
      assert(ex == win && ex.size == 200)
    }
  }

  test("(f) chunkDedup conservation: every chunk survives exactly once globally") {
    import graft.operators.DedupOps
    for (seed <- 1 to 3) {
      val r = new Random(seed)
      // small vocab + short chunks → plenty of cross-doc collisions
      val docs = (0 until 40).map(i =>
        (i.toLong, (0 until 4 + r.nextInt(20))
          .map(_ => s"w${r.nextInt(6)}").mkString(" ")))
        .toDF("id", "text")
      val out = DedupOps.chunkDedup(docs, "id", "text", 3)
        .as[(Long, Long, Long, String)].collect()
      val keptChunks = out.flatMap(_._4.split(" ").grouped(3).map(_.mkString(" ")))
      // kept chunks are globally distinct...
      assert(keptChunks.distinct.length == keptChunks.length)
      // ...and cover exactly the corpus's distinct chunk set.
      val allChunks = docs.as[(Long, String)].collect()
        .flatMap { case (_, t) =>
          t.split(" ").grouped(3).map(_.mkString(" ")) }.distinct
      assert(keptChunks.sorted.toSeq == allChunks.sorted.toSeq)
    }
  }

  test("(g) mixtureSample bounds: rates in (0,1], keeps ≤ counts, binding source exact") {
    import graft.operators.MixtureOps
    for (seed <- 1 to 3) {
      val r = new Random(seed)
      val df = (0 until 300).map(i =>
        (i.toLong, s"s${r.nextInt(4)}")).toDF("id", "source")
      val w = Map("s0" -> 0.4, "s1" -> 0.35, "s2" -> 0.25)
      val out = MixtureOps.mixtureSample(df, "source", "id", w)
        .as[(String, Long, Double, Long, Long)].collect()
      assert(out.map(_._1).toSet == w.keySet)   // s3 excluded
      out.foreach { case (_, n, rate, keep, _) =>
        assert(rate > 0.0 && rate <= 1.0 && keep <= n)
      }
      assert(out.exists(_._3 == 1.0), "some source must bind the mixture")
    }
  }

  test("(e) mutual information is symmetric: MI(x,y) = MI(y,x)") {
    for (seed <- 1 to 3) {
      val r = new Random(seed)
      val df = (0 until 200)
        .map(_ => (s"c${r.nextInt(4)}", r.nextInt(3))).toDF("x", "y")
      val a = graft.operators.MetricOps.mutualInfo(df, "x", "y")
        .collect().head.getDouble(0)
      val b = graft.operators.MetricOps.mutualInfo(df, "y", "x")
        .collect().head.getDouble(0)
      assert(a == b, s"MI($a) != MI_swapped($b)")
    }
  }

  test("(f) JS divergence is symmetric under side swap") {
    for (seed <- 1 to 3) {
      val r = new Random(seed)
      val docs = (0L until 40L).map(i =>
        (i, (0 until 10).map(_ => s"t${r.nextInt(15)}").mkString(" ")))
        .toDF("doc_id", "text")
      val a = graft.operators.TextOps.jsDivergence(docs, "text",
        col("doc_id") % 2 === 0).collect().head.getDouble(2)
      val b = graft.operators.TextOps.jsDivergence(docs, "text",
        col("doc_id") % 2 =!= 0).collect().head.getDouble(2)
      assert(a == b, s"JS($a) != JS_swapped($b)")
    }
  }

  test("(g) Spearman is invariant under strictly monotone transforms") {
    for (seed <- 1 to 3) {
      val r = new Random(seed)
      // values rounded to 1 dp → plenty of ties, exercising average ranks
      val rows = (0 until 300).map { _ =>
        ("g", math.rint(r.nextDouble() * 100) / 10.0,
          math.rint(r.nextDouble() * 100) / 10.0)
      }
      val df = rows.toDF("g", "x", "y")
      val tdf = rows.map { case (g, x, y) => (g, x * x, y) } // monotone on x≥0
        .toDF("g", "x", "y")
      val a = graft.operators.MetricOps.spearman(df, "g", "x", "y")
        .collect().head.getDouble(1)
      val b = graft.operators.MetricOps.spearman(tdf, "g", "x", "y")
        .collect().head.getDouble(1)
      assert(a == b, s"spearman($a) != transformed($b)")
    }
  }

  test("(h) chunkDocuments tiles every token for random sizes and strides") {
    import graft.operators.TextOps
    val r = new Random(41)
    for (_ <- 1 to 8) {
      val chunkSize = 2 + r.nextInt(12)
      val stride = 1 + r.nextInt(chunkSize)
      val docs = (1 to 12).map(i =>
        (i.toLong, (1 to (1 + r.nextInt(40))).map(p => s"w$p").mkString(" ")))
      val lens = docs.map { case (id, t) => id -> t.split(" ").length }.toMap
      val out = TextOps.chunkDocuments(docs.toDF("doc_id", "text"),
          "doc_id", "text", chunkSize, stride)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      for ((id, n) <- lens) {
        val chunks = out.filter(_._1 == id).sortBy(_._2)
        // union of [start, start+len) covers 1..n exactly, no gaps
        assert(chunks.flatMap(c => c._3 until (c._3 + c._4)).toSet ==
          (1L to n).toSet, s"size=$chunkSize stride=$stride doc=$id n=$n")
        // every chunk except possibly the last is full-size
        assert(chunks.dropRight(1).forall(_._4 == chunkSize))
        // consecutive starts differ by exactly the stride
        assert(chunks.zip(chunks.drop(1)).forall {
          case (a, b) => b._3 - a._3 == stride
        })
      }
    }
  }

  test("(i) ksStatistic is symmetric under label flip and bounded in [0,1]") {
    import graft.operators.MetricOps
    val r = new Random(43)
    val rows = (1 to 300).map(_ => (r.nextInt(2), r.nextInt(40) / 8.0))
    val df = rows.toDF("label", "score").repartition(6)
    val flipped = rows.map { case (y, s) => (1 - y, s) }
      .toDF("label", "score").repartition(3)
    val a = MetricOps.ksStatistic(df, "label", "score").head()
    val b = MetricOps.ksStatistic(flipped, "label", "score").head()
    assert(a.getDouble(0) == b.getDouble(0), "|F+−F−| is flip-symmetric")
    assert(a.getDouble(0) >= 0.0 && a.getDouble(0) <= 1.0)
    assert(a.getLong(1) == b.getLong(2) && a.getLong(2) == b.getLong(1))
  }

  test("(d) hybrid union score = sum of channel scores per key") {
    for (seed <- 1 to 3) {
      val r = new Random(seed)
      val chans = (0 until 3).map { c =>
        (0 until 30).map(_ => (r.nextInt(10).toLong, r.nextInt(100) / 10.0))
          .toDF("k", "score")
      }
      val got = RelationalOps.hybridUnion(chans, Seq("k"), "score")
        .as[(Long, Double)].collect().toMap
      val want = chans.flatMap(_.as[(Long, Double)].collect())
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-9) }
      assert(got.keySet == want.keySet)
    }
  }
}
