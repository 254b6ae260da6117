package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Feature metadata — the engine's replacement for the reference's
  * pickled feat_meta dict (offline/rank/s1_feature_engi.py:72-89,
  * consumed by data_exchange_center/parse_feat_meta.py:4-26).
  *
  * The positional contract matters: model input column order is
  * sparse ids, then sparse side features, then dense
  * (parse_feat_meta.py:10-24) — here encoded as the ordered `sparse`
  * and `dense` lists that feed VectorAssembler's inputCols.
  *
  * Persisted as a JSON artifact (one small file), not a binary pickle —
  * readable by any stage or engine.
  */
case class FeatMeta(sparse: Seq[SparseFeat], dense: Seq[String]) {
  /** VectorAssembler input order: sparse ids first, then dense. */
  def inputCols: Seq[String] = sparse.map(_.name) ++ dense

  def toJson: String = {
    val s = sparse.map(f => s"""{"name":"${f.name}","cardinality":${f.cardinality}}""")
      .mkString("[", ",", "]")
    val d = dense.map(n => s""""$n"""").mkString("[", ",", "]")
    s"""{"sparse":$s,"dense":$d}"""
  }
}

case class SparseFeat(name: String, cardinality: Long)

object FeatMeta {

  /** A6 — derive sparse cardinalities as max(code)+1 over the TRAIN
    * frame (s1_feature_engi.py:76,80). One tiny driver-side collect
    * (O(#features) scalars) — the sanctioned meta collect.
    */
  def derive(train: DataFrame, sparseCols: Seq[String],
             denseCols: Seq[String]): FeatMeta = {
    val aggs = sparseCols.map(c => (max(col(c)) + 1).cast("long").as(c))
    val row = train.agg(aggs.head, aggs.tail: _*).head()
    val sparse = sparseCols.zipWithIndex.map { case (c, i) =>
      require(!row.isNullAt(i),
        s"FeatMeta.derive: train frame is empty or column '$c' is all-null — " +
          "cannot derive a cardinality")
      SparseFeat(c, row.getLong(i))
    }
    FeatMeta(sparse, denseCols)
  }

  def save(meta: FeatMeta, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), meta.toJson)
}
