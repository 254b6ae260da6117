package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregator: per-group top-k by (score desc, id asc)
  * as a single hash aggregation with an O(k) buffer.
  *
  * The window form (`row_number over (partition by g order by s desc)`,
  * RelationalOps.topKPerGroup) shuffles and SORTS every row of every
  * group — O(n log n) per group and full-shuffle volume. This
  * aggregator keeps only k candidates per group on the map side
  * (partial aggregation), so shuffle volume drops from n rows to
  * ≤ k·|groups| and per-row cost is O(log k) — the shape that wins at
  * 100 TB when k ≪ group size (top-50 of millions of candidate items).
  *
  * Results are bit-identical to the window form including the
  * deterministic (score desc, id asc) tiebreak — asserted in
  * TopKAggregatorSpec.
  */
class TopKAggregator(k: Int)
  extends Aggregator[TopKAggregator.In, List[(Double, Long)], Seq[TopKAggregator.Out]] {
  import TopKAggregator.{In, Out}

  // buffer: up to k entries, kept sorted best-first by (score desc, id asc)
  override def zero: List[(Double, Long)] = Nil

  // Double.compare, not >: NaN must order as greater-than-everything
  // (Spark DESC and DuckDB both sort NaN first), and a raw > returns
  // false for every NaN comparison, which would corrupt the sorted
  // buffer invariant and evict genuinely-best rows.
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  private def insert(buf: List[(Double, Long)],
                     e: (Double, Long)): List[(Double, Long)] = {
    val (front, back) = buf.span(better(_, e))
    val merged = front ::: e :: back
    if (merged.length > k) merged.take(k) else merged
  }

  override def reduce(buf: List[(Double, Long)], in: In): List[(Double, Long)] =
    insert(buf, (in.score, in.id))

  override def merge(a: List[(Double, Long)],
                     b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[(Double, Long)]): Seq[Out] =
    buf.map { case (s, i) => Out(i, s) }

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    Encoders.kryo[List[(Double, Long)]]
  override def outputEncoder: Encoder[Seq[Out]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopKAggregator {
  case class In(score: Double, id: Long)
  case class Out(id: Long, score: Double)

  /** Untyped column form: `top_k(score, id)` usable in
    * `groupBy(...).agg(...)` (udaf flattens the In encoder's fields
    * into positional arguments).
    */
  def topK(k: Int, scoreCol: Column, idCol: Column): Column =
    udaf(new TopKAggregator(k), Encoders.product[In]).apply(scoreCol, idCol)
}
