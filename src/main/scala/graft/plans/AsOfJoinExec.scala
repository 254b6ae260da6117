package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, BinaryExpression, Expression, GenericInternalRow, JoinedRow, Predicate, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.expressions.PredicateHelper
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Whole-operator extension for the point-in-time join (J4): a native
  * sort-merge as-of join, planned from the BUILT-IN `Join` logical node
  * rather than a custom one.
  *
  * Design choice (SURVEY §7.4 step (c), deliberately varied): the
  * operator's logical form is an ordinary join whose condition carries
  * the [[AsOfMarker]] predicate `graft_asof(leftTs, rightTs)`. Keeping
  * the logical plan a plain `Join` means Catalyst's own machinery —
  * filter pushdown through joins, column pruning, join-side statistics —
  * applies for free; a custom `LogicalPlan` node would opt out of every
  * one of those rules until hand-written equivalents existed. Only the
  * PHYSICAL translation is custom: [[AsOfJoinStrategy]] plans the
  * marked join into [[AsOfJoinExec]], whose declared distribution +
  * ordering requirements make `EnsureRequirements` insert exactly the
  * hash exchanges and in-partition sorts a shuffled sort-merge join
  * needs. No code is borrowed from the reference engine (its PIT logic
  * is a pandas merge, offline/rank/s1_feature_engi.py).
  *
  * At 100 TB: one hash exchange per side on the key columns, one
  * in-partition sort each — identical movement cost to an equi sort-
  * merge join; the merge itself is a single forward scan holding ONE
  * buffered right row, so memory is O(1) per partition regardless of
  * key-group size (the window-form [[graft.operators.AsOfJoin]] twin
  * buffers a running frame instead).
  */
case class AsOfMarker(left: Expression, right: Expression)
  extends BinaryExpression with Predicate {

  override def nullable: Boolean = false
  override def prettyName: String = "graft_asof"

  private def unplanned = throw new UnsupportedOperationException(
    "graft_asof is a join-condition marker and must be planned by " +
      "AsOfJoinStrategy — call GraftExtensions.register(spark) (or set " +
      "spark.sql.extensions=graft.plans.GraftExtensions) and use it only " +
      "as a top-level conjunct of an inner/left join condition")

  override def eval(input: InternalRow): Any = unplanned
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = unplanned

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AsOfMarker =
    copy(left = newLeft, right = newRight)
}

/** Plans `Join(..., cond = equiKeys ∧ graft_asof(lts, rts))` into
  * [[AsOfJoinExec]]. Any other shape (extra non-equi conjuncts, marker
  * under OR/NOT, unsupported join type) is left to the default planner,
  * whose nested-loop fallback surfaces [[AsOfMarker]]'s guidance error
  * instead of silently wrong results.
  */
case class AsOfJoinStrategy(spark: SparkSession) extends SparkStrategy
  with PredicateHelper {

  import org.apache.spark.sql.catalyst.expressions.EqualTo

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(l, r, jt, Some(cond), _)
        if (jt == Inner || jt == LeftOuter) &&
          cond.exists(_.isInstanceOf[AsOfMarker]) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val (markers, equis) = conjuncts.partition(_.isInstanceOf[AsOfMarker])
      val keys = equis.map {
        case EqualTo(a, b) if a.references.subsetOf(l.outputSet) &&
          b.references.subsetOf(r.outputSet) => Some((a, b))
        case EqualTo(a, b) if a.references.subsetOf(r.outputSet) &&
          b.references.subsetOf(l.outputSet) => Some((b, a))
        case _ => None
      }
      markers match {
        case Seq(m: AsOfMarker) if keys.nonEmpty && keys.forall(_.isDefined) =>
          val (lk, rk) = keys.flatten.unzip
          val (lts, rts) =
            if (m.left.references.subsetOf(l.outputSet)) (m.left, m.right)
            else (m.right, m.left)
          if (lts.references.subsetOf(l.outputSet) &&
              rts.references.subsetOf(r.outputSet))
            AsOfJoinExec(lk, rk, lts, rts, jt == LeftOuter,
              planLater(l), planLater(r)) :: Nil
          else Nil
        case _ => Nil
      }
    case _ => Nil
  }
}

/** Shuffled sort-merge as-of join: for each left row, attach the right
  * row with equal keys and the greatest rightTs ≤ leftTs (inclusive
  * backward as-of — DuckDB `ASOF JOIN` semantics). Inner drops
  * unmatched left rows; left-outer null-extends them. SQL-standard null
  * semantics: a null in any key or in a timestamp never matches.
  *
  * Ties: among right rows with EQUAL (key, ts) the winner is whichever
  * sorts last in the partition — not a contract. Callers needing a
  * total order deduplicate the right side on (key, ts) first (one
  * `dropDuplicates`/keep-latest window), as every declared oracle query
  * does.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    isLeftOuter: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType) &&
    leftTs.dataType == rightTs.dataType, "as-of join sides must align in type")

  override def output: Seq[Attribute] =
    if (isLeftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys, false, None),
      ClusteredDistribution(rightKeys, false, None))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val outer = isLeftOuter
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // Orderings are codegen'd objects — built per partition from the
      // (serializable) data types, never shipped from the driver.
      val keyOrdering = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrdering = TypeUtils.getInterpretedOrdering(tsType)
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTsBound = BindReferences.bindReference(leftTs, left.output)
      val rTsBound = BindReferences.bindReference(rightTs, right.output)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(right.output.size)
      // Bind against `output` (not the raw child attributes): under
      // left-outer the right attributes are nullable HERE even when the
      // child schema says otherwise, and codegen must keep null checks.
      val resultProj = UnsafeProjection.create(output, output)
      val rBuf = rIter.buffered

      // One buffered candidate: the newest right row (in (key, ts)
      // order) already known to satisfy ts ≤ current left ts. Rows from
      // child iterators are reused buffers — the candidate is copied at
      // adoption; everything else is compared in place.
      var cand: InternalRow = null
      var candKey: UnsafeRow = null

      new Iterator[InternalRow] {
        private var ready: InternalRow = _

        private def advance(): Unit = {
          while (ready == null && lIter.hasNext) {
            val lRow = lIter.next()
            val lKey = lKeyProj(lRow)
            val lTsVal = lTsBound.eval(lRow)
            if (lKey.anyNull || lTsVal == null) {
              if (outer) ready = resultProj(joined(lRow, nullRight))
            } else {
              var scan = true
              while (scan && rBuf.hasNext) {
                val rKey = rKeyProj(rBuf.head)
                val kc = keyOrdering.compare(rKey, lKey)
                if (kc < 0) { rBuf.next() }   // behind every future left key
                else if (kc > 0) scan = false
                else if (rKey.anyNull) { rBuf.next() }
                else {
                  val rTsVal = rTsBound.eval(rBuf.head)
                  if (rTsVal == null) { rBuf.next() }
                  else if (tsOrdering.lteq(rTsVal, lTsVal)) {
                    cand = rBuf.next().copy()
                    candKey = rKey.copy()
                  } else scan = false
                }
              }
              val hit = cand != null && candKey != null &&
                keyOrdering.compare(candKey, lKey) == 0
              if (hit) ready = resultProj(joined(lRow, cand))
              else if (outer) ready = resultProj(joined(lRow, nullRight))
            }
          }
        }

        override def hasNext: Boolean = { advance(); ready != null }
        override def next(): InternalRow = {
          advance()
          val out = ready; ready = null; numOutputRows += 1; out
        }
      }
    }
  }
}
