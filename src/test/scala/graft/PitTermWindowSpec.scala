package graft

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.functions._
import graft.operators.RelationalOps

/** Crown-jewel fidelity: the Spark PIT term operators must equal a
  * literal re-implementation of the reference's dequeue
  * (offline/preprocess/s2_term_trans.py:42-61): iterate a user's
  * impressions in order, snapshot per-genre [imp, clk] counters BEFORE
  * appending the current row, append, pop the front beyond 10 rows;
  * flush per-user counters AFTER the final append (≤11 rows).
  */
class PitTermWindowSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq("g0", "g1", "g2", "g3")

  /** Randomized impressions: (user, rn, terms, label). */
  private def genData(seed: Int): Seq[(Long, Long, Seq[String], Int)] = {
    val r = new Random(seed)
    for {
      u <- 0L until 6L
      n = 3 + r.nextInt(25)                    // users with 3..27 impressions
      i <- 0 until n
    } yield (u, i.toLong,
      r.shuffle(vocab).take(1 + r.nextInt(3)).sorted, r.nextInt(2))
  }

  /** The reference dequeue (s2_term_trans.py:38-61), verbatim
    * semantics: imp_dict[i] covers rows [max(0, i−10), i−1]. Returns
    * (user, rn, term) -> (imp, clk) for every vocab term.
    */
  private def dequeueOracle(data: Seq[(Long, Long, Seq[String], Int)])
      : Map[(Long, Long, String), (Long, Long)] = {
    val perImp = mutable.Map[(Long, Long, String), (Long, Long)]()
    data.groupBy(_._1).foreach { case (u, rowsUnsorted) =>
      val rows = rowsUnsorted.sortBy(_._2)
      val buf = mutable.Queue[(Seq[String], Int)]()
      rows.foreach { case (_, rn, terms, label) =>
        val counters = mutable.Map[String, (Long, Long)]().withDefaultValue((0L, 0L))
        buf.foreach { case (ts, l) =>
          ts.foreach { t =>
            val (i, c) = counters(t); counters(t) = (i + 1, c + l)
          }
        }
        vocab.foreach(t => perImp((u, rn, t)) = counters(t))
        buf.enqueue((terms, label))
        if (buf.size > 10) buf.dequeue()       // keep the last ≤10 rows
      }
    }
    perImp.toMap
  }

  private lazy val data = genData(42)
  private lazy val df = data.toDF("user_id", "rn", "terms", "label")

  test("pitTermFeatures (dense grid) equals the reference dequeue for every (impression, term)") {
    val oracle = dequeueOracle(data)
    val got = RelationalOps.pitTermFeatures(df, "user_id", "rn", "terms",
        "label", vocab, 10)
      .select("user_id", "rn", "term", "term_imp", "term_clk")
      .as[(Long, Long, String, Long, Long)].collect()
    assert(got.length == oracle.size)
    got.foreach { case (u, rn, t, imp, clk) =>
      assert(oracle((u, rn, t)) == ((imp, clk)),
        s"mismatch at user=$u rn=$rn term=$t: got ($imp,$clk), want ${oracle((u, rn, t))}")
    }
  }

  test("pitTermWindow (sparse RANGE form) agrees with the dense grid on present terms") {
    val dense = RelationalOps.pitTermFeatures(df, "user_id", "rn", "terms",
        "label", vocab, 10)
      .select("user_id", "rn", "term", "term_imp", "term_clk")
      .as[(Long, Long, String, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> ((r._4, r._5))).toMap
    val sparse = RelationalOps.pitTermWindow(df, "user_id", "rn", "terms",
        "label", 10)
      .select("user_id", "rn", "term", "term_imp", "term_clk")
      .as[(Long, Long, String, Long, Long)].collect()
    sparse.foreach { case (u, rn, t, imp, clk) =>
      assert(dense((u, rn, t)) == ((imp, clk)))
    }
  }

  test("pivotTermFeatures widens with 0 defaults in vocab order") {
    val wide = RelationalOps.pivotTermFeatures(
      RelationalOps.pitTermFeatures(df, "user_id", "rn", "terms", "label", vocab, 10),
      Seq("user_id", "rn"), vocab, "user_")
    assert(wide.columns.toSeq ==
      Seq("user_id", "rn") ++ vocab.flatMap(v => Seq(s"user_${v}_imp", s"user_${v}_clk")))
    assert(wide.count() == df.count())
    // first impression of each user: all-zero features (empty buffer)
    val first = wide.filter(col("rn") === 0)
      .select(vocab.map(v => col(s"user_${v}_imp")): _*).collect()
    assert(first.forall(r => (0 until vocab.length).forall(r.getLong(_) == 0L)))
  }

  test("termSnapshot applies the click threshold over the last ≤11 rows") {
    val withCnt = df.withColumn("u_cnt", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
    val snap = RelationalOps.termSnapshot(withCnt, "user_id", "rn", "u_cnt",
        "terms", "label", 10, 1L)
      .as[(Long, Seq[String])].collect().toMap
    // recompute naively: last min(n, 11) rows per user
    val naive = data.groupBy(_._1).flatMap { case (u, rows) =>
      val last = rows.sortBy(_._2).takeRight(11)
      val clk = mutable.Map[String, Long]().withDefaultValue(0L)
      last.foreach { case (_, _, ts, l) => ts.foreach(t => clk(t) += l) }
      val terms = clk.filter(_._2 >= 1L).keys.toSeq.sorted
      if (terms.nonEmpty) Some(u -> terms) else None
    }
    assert(snap == naive)
  }
}
