package graft

import graft.operators.{DedupOps, MetricOps}
import org.apache.spark.sql.functions._

/** Round-34 specs: mutual-best-match admission (one-sided best is
  * rejected) and the stump split's exact Gini arithmetic with the
  * smaller-threshold tiebreak.
  */
class Round34OpsSpec extends SparkSpec {
  import spark.implicits._

  test("reciprocalBestMatch: mutual best admits; one-sided best does " +
    "not") {
    val old = Seq((1L, "s", "a b c d e"), (2L, "s", "a b c d f"))
      .toDF("doc_id", "source", "text")
    val nw = Seq((3L, "s", "a b c d e")).toDF("doc_id", "source", "text")
    val r = DedupOps.reciprocalBestMatch(old, nw, "doc_id", "source",
      "text").collect()(0)
    // n3's best old is the exact copy 1, so 2's one-sided claim fails
    assert(r.getAs[Long]("n_old") == 2L)
    assert(r.getAs[Long]("n_matched") == 1L)
    assert(r.getAs[Long]("match_ppm") == 500000L)
    assert(r.getAs[Long]("mean_match_jaccard_ppm") == 1000000L)
  }

  test("stumpSplit: exact Gini with the smaller-threshold tiebreak") {
    val df = Seq((1L, 1L), (1L, 1L), (2L, 1L), (2L, 0L), (3L, 0L),
      (3L, 0L)).toDF("x", "y")
    val r = MetricOps.stumpSplit(df, col("x"), col("y")).collect()(0)
    // t=1 and t=2 both give weighted impurity 1.5/6 — tie to t=1
    assert(r.getAs[Long]("threshold") == 1L)
    assert(r.getAs[Long]("n_left") == 2L)
    assert(r.getAs[Long]("n_pos_left") == 2L)
    assert(r.getAs[Long]("n_right") == 4L)
    assert(r.getAs[Long]("n_pos_right") == 1L)
    assert(r.getAs[Double]("weighted_gini") == 0.25)
    assert(r.getAs[Double]("gini_gain") == 0.25)
  }
}
