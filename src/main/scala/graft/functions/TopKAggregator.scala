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
  * ≤ k·|groups| and per-row cost is O(1) for the common rejected row —
  * the shape that wins at 100 TB when k ≪ group size (top-50 of
  * millions of candidate items).
  *
  * Buffer is a mutable pair of primitive arrays kept sorted best-first
  * (was an immutable List: every input row paid an O(k) cons-cell walk
  * and allocation even when rejected — at 4M candidate rows per query
  * that allocation churn dominated the aggregation; r13 optimization).
  * A full buffer rejects a non-qualifying row after ONE comparison
  * against the current k-th entry.
  *
  * Results are bit-identical to the window form including the
  * deterministic (score desc, id asc) tiebreak — asserted in
  * TopKAggregatorSpec.
  */
class TopKAggregator(k: Int)
  extends Aggregator[TopKAggregator.In, TopKAggregator.Buf, Seq[TopKAggregator.Out]] {
  import TopKAggregator.{In, Out, Buf}

  // k = 0 would index buf.scores(-1) on the first row (the r13 array
  // buffer); fail at construction with a message instead (ADVICE r13).
  require(k > 0, s"TopKAggregator needs k > 0, got $k")

  override def zero: Buf = new Buf(0, new Array[Double](k), new Array[Long](k))

  // Double.compare, not >: NaN must order as greater-than-everything
  // (Spark DESC and DuckDB both sort NaN first), and a raw > returns
  // false for every NaN comparison, which would corrupt the sorted
  // buffer invariant and evict genuinely-best rows.
  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  private def insert(buf: Buf, s: Double, id: Long): Buf = {
    val n = buf.n
    if (n == k && !better(s, id, buf.scores(k - 1), buf.ids(k - 1)))
      return buf // common case: worse than the current k-th entry
    // insertion position = number of entries strictly better than e
    var pos = n
    while (pos > 0 && !better(buf.scores(pos - 1), buf.ids(pos - 1), s, id))
      pos -= 1
    val last = if (n == k) k - 1 else n // entries shifting right of pos
    var i = last
    while (i > pos) {
      buf.scores(i) = buf.scores(i - 1)
      buf.ids(i) = buf.ids(i - 1)
      i -= 1
    }
    buf.scores(pos) = s
    buf.ids(pos) = id
    if (n < k) buf.n = n + 1
    buf
  }

  override def reduce(buf: Buf, in: In): Buf = insert(buf, in.score, in.id)

  override def merge(a: Buf, b: Buf): Buf = {
    var i = 0
    var acc = a
    while (i < b.n) { acc = insert(acc, b.scores(i), b.ids(i)); i += 1 }
    acc
  }

  override def finish(buf: Buf): Seq[Out] = {
    val out = new scala.collection.mutable.ArrayBuffer[Out](buf.n)
    var i = 0
    while (i < buf.n) { out += Out(buf.ids(i), buf.scores(i)); i += 1 }
    out.toSeq
  }

  override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
  override def outputEncoder: Encoder[Seq[Out]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopKAggregator {
  case class In(score: Double, id: Long)
  case class Out(id: Long, score: Double)

  /** Mutable top-k buffer: first `n` slots of the parallel arrays hold
    * the current best entries sorted by (score desc, id asc).
    */
  final class Buf(var n: Int, val scores: Array[Double], val ids: Array[Long])
    extends Serializable

  /** Untyped column form: `top_k(score, id)` usable in
    * `groupBy(...).agg(...)` (udaf flattens the In encoder's fields
    * into positional arguments).
    */
  def topK(k: Int, scoreCol: Column, idCol: Column): Column =
    udaf(new TopKAggregator(k), Encoders.product[In]).apply(scoreCol, idCol)
}
