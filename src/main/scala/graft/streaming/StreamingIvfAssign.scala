package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming twin of the trained-IVF assignment
  * ([[graft.operators.SimilarityOps]] q440/q441): route a vector
  * STREAM to the cells of a FROZEN codebook trained batch-side.
  *
  * The codebook is ≤kCent (cid, ppm-centroid) rows by construction, so
  * it folds into one literal array at plan build — scoring is then
  * MAP-ONLY: the ppm quantization, every integer squared-L2 distance
  * and the (dist, cid) argmin all evaluate inside a single projection
  * per row. No state store, no stream-static join, no shuffle, no
  * watermark; a codebook refresh is a query restart with a new literal
  * (the frozen-model serving pattern of [[StreamingScore]]).
  *
  * Determinism contract (StreamingIvfAssignSpec): arithmetic is the
  * BIGINT math of the batch assigner — exact, order-independent — and
  * the fold's argmin keeps strictly-better (d, cid) candidates, so the
  * result is independent of codebook order and bit-identical to the
  * batch `min(struct(d, cid))` tiebreak.
  */
object StreamingIvfAssign {

  /** Assign each streamed vector: output (idCol, cid, dist2). */
  def assign(stream: DataFrame, idCol: String, embCol: String,
             codebook: Seq[(Long, Seq[Long])]): DataFrame = {
    require(codebook.nonEmpty, "cannot assign against an empty codebook")
    val cb = typedLit(codebook)
    def dist(c: Column): Column =
      aggregate(zip_with(col("__q"), c.getField("_2"),
        (x, y) => (x - y) * (x - y)), lit(0L), (a, v) => a + v)
    stream
      .withColumn("__q", expr(s"transform($embCol, " +
        "x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"))
      .withColumn("__best", aggregate(cb,
        struct(lit(Long.MaxValue).as("d"), lit(Long.MaxValue).as("cid")),
        (acc, c) => {
          val d = dist(c)
          when(d < acc.getField("d") ||
              (d === acc.getField("d") &&
                c.getField("_1") < acc.getField("cid")),
            struct(d.as("d"), c.getField("_1").as("cid")))
            .otherwise(acc)
        }))
      .select(col(idCol), col("__best.cid").as("cid"),
        col("__best.d").as("dist2"))
  }
}
