package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature metadata — the engine's replacement for the reference's
  * pickled feat_meta dict (offline/rank/s1_feature_engi.py:72-89,
  * consumed by data_exchange_center/parse_feat_meta.py:4-26).
  *
  * The positional contract matters: model input column order is
  * sparse ID features, then sparse SIDE features, then dense
  * (parse_feat_meta.py:10-24, consumed positionally by
  * online/utils/triton_caller.py:15-20 — the 59-feature contract is
  * 5 one-hot + 18 multi-hot + 36 dense). Here each group is an ordered
  * list; `inputCols` concatenates them in that exact order for
  * VectorAssembler.
  *
  * Persisted as a JSON artifact (one small file), not a binary pickle —
  * readable by any stage or engine.
  */
case class FeatMeta(sparseId: Seq[SparseFeat], sparseSide: Seq[SparseFeat],
                    dense: Seq[String]) {
  /** All sparse features in positional order (id group then side group). */
  def sparse: Seq[SparseFeat] = sparseId ++ sparseSide

  /** VectorAssembler input order: sparse ids, sparse side, then dense —
    * the reference's positional slot layout.
    */
  def inputCols: Seq[String] =
    sparseId.map(_.name) ++ sparseSide.map(_.name) ++ dense

  def toJson: String = {
    def grp(fs: Seq[SparseFeat]) = fs
      .map(f => s"""{"name":"${f.name}","cardinality":${f.cardinality}}""")
      .mkString("[", ",", "]")
    val d = dense.map(n => s""""$n"""").mkString("[", ",", "]")
    s"""{"sparse_id":${grp(sparseId)},"sparse_side":${grp(sparseSide)},"dense":$d}"""
  }
}

case class SparseFeat(name: String, cardinality: Long)

object FeatMeta {

  /** A6 — derive sparse cardinalities as max(code)+1 over the TRAIN
    * frame (s1_feature_engi.py:76,80), for both the id and side sparse
    * groups in one aggregation. One tiny driver-side collect
    * (O(#features) scalars) — the sanctioned meta collect.
    */
  def derive(train: DataFrame, sparseIdCols: Seq[String],
             sparseSideCols: Seq[String], denseCols: Seq[String]): FeatMeta = {
    val allSparse = sparseIdCols ++ sparseSideCols
    val aggs = allSparse.map(c => (max(col(c)) + 1).cast("long").as(c))
    val row = train.agg(aggs.head, aggs.tail: _*).head()
    val feats = allSparse.zipWithIndex.map { case (c, i) =>
      require(!row.isNullAt(i),
        s"FeatMeta.derive: train frame is empty or column '$c' is all-null — " +
          "cannot derive a cardinality")
      SparseFeat(c, row.getLong(i))
    }
    val (idFeats, sideFeats) = feats.splitAt(sparseIdCols.length)
    FeatMeta(idFeats, sideFeats, denseCols)
  }

  /** Two-group convenience: all sparse columns are id features. */
  def derive(train: DataFrame, sparseCols: Seq[String],
             denseCols: Seq[String]): FeatMeta =
    derive(train, sparseCols, Nil, denseCols)

  def save(meta: FeatMeta, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), meta.toJson)
}
