package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ml.{FeatMeta, RecsysModels}
import graft.operators.RelationalOps
import graft.tables.Tables

/** M1–M7 — ALS recall vectors, FMClassifier ranker with early stopping,
  * in-engine scoring, saved-model parity. Statistical assertions only
  * (AUC above chance), never bitwise (SURVEY §7.5.5).
  */
class MlSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // Training frame: predict "click" (value>100) from (user, item-code,
  // PIT behavior counters) over events — the rank pipeline in miniature.
  private lazy val base = {
    val ev = Tables.events(spark, dir)
      .withColumn("label", when(col("value") > 100, 1).otherwise(0))
      .withColumn("item",
        when(col("event_type") === "click", 0).when(col("event_type") === "error", 1)
          .when(col("event_type") === "purchase", 2)
          .when(col("event_type") === "signup", 3).otherwise(4))
    RelationalOps.pitWindow(ev, "user_id", Seq(col("ts"), col("event_id")),
        "label", 10)
      .select(col("user_id"), col("item"), col("label").cast("double").as("label"),
        col("pit_imp").cast("double").as("pit_imp"),
        col("pit_clk").cast("double").as("pit_clk"),
        col("event_id"))
  }

  test("M1: ALS implicit recall trains and exports dim-16 vectors") {
    val m = RecsysModels.trainRecall(base, "user_id", "item", "label")
    val (uv, iv) = RecsysModels.exportVectors(m)
    assert(uv.count() > 0 && iv.count() > 0)
    assert(uv.select("vector").as[Seq[Float]].head().length == RecsysModels.VECTOR_DIM)

    // batch recall: k candidates per user, sigmoid-calibrated scores
    val recs = RecsysModels.recallTopK(m, 3)
    val perUser = recs.groupBy("user_id").count().select("count").as[Long].collect()
    assert(perUser.forall(_ <= 3) && perUser.nonEmpty)
    val scores = recs.select("score").as[Double].collect()
    assert(scores.forall(s => s > 0.0 && s < 1.0))
  }

  test("FeatMeta positional contract: sparse_id + sparse_side + dense order") {
    // The reference's model input layout (parse_feat_meta.py:10-24,
    // consumed positionally by triton_caller.py:15-20): id sparse
    // features first, then side sparse features, then dense — here the
    // 59-feature contract in miniature (2 id + 1 side + 2 dense).
    val withSide = base.withColumn("item_genre", col("item") % 2)
    val meta = FeatMeta.derive(withSide, Seq("user_id", "item"),
      Seq("item_genre"), Seq("pit_imp", "pit_clk"))
    assert(meta.inputCols == Seq("user_id", "item", "item_genre", "pit_imp", "pit_clk"))
    assert(meta.sparseId.map(_.name) == Seq("user_id", "item"))
    assert(meta.sparseSide.map(_.name) == Seq("item_genre"))
    assert(meta.sparseSide.head.cardinality == 2L)
    // serialized artifact carries the three groups separately
    assert(meta.toJson.contains("\"sparse_side\":[{\"name\":\"item_genre\""))
    // assembled vector honors the positional order (dim = #inputCols)
    val v = RecsysModels.assemble(withSide, meta)
      .select("features").head().getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(v.size == 5)
  }

  test("P8 wiring: a constant feature is pruned before assembly") {
    val withConst = base.withColumn("dead_feat", lit(0.0))
    val kept = Pipeline.pruneConstant(withConst,
      Seq("pit_imp", "dead_feat", "pit_clk"))
    assert(kept == Seq("pit_imp", "pit_clk"), s"got $kept")
    val meta = FeatMeta.derive(withConst, Seq("user_id", "item"), Nil, kept)
    assert(!meta.inputCols.contains("dead_feat"))
    val v = RecsysModels.assemble(withConst, meta)
      .select("features").head().getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(v.size == meta.inputCols.length && v.size == 4)
  }

  test("M2/M4/M5/M6: FM ranker early-stop loop beats chance AUC") {
    val meta = FeatMeta.derive(base, Seq("user_id", "item"), Seq("pit_imp", "pit_clk"))
    val assembled = RecsysModels.assemble(base, meta)
    val train = assembled.filter(col("event_id") % 5 =!= 0)
    val test_ = assembled.filter(col("event_id") % 5 === 0)
    val (model, auc) = RecsysModels.trainRanker(train, test_, "label",
      maxRounds = 2, itersPerRound = 20)
    assert(model != null)
    assert(auc > 0.5, s"AUC $auc must beat chance")

    // M3: in-engine scoring produces calibrated probabilities
    val scores = RecsysModels.score(model, test_.limit(100))
      .select("score").as[Double].collect()
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))

    // A9 evaluator form agrees with the early-stop loop's best AUC
    assert(math.abs(RecsysModels.auc(model, test_, "label") - auc) < 1e-12)

    // M7: save/reload score parity
    val path = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "fm-model").toString
    assert(RecsysModels.scoreParity(model, test_.limit(50), path))
  }
}
