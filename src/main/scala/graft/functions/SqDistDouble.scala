package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native DOUBLE squared-L2 distance over two `array<double>` columns —
  * [[SqDistLong]]'s pattern for the cluster-quality sweeps
  * (daviesBouldin / simplifiedSilhouette), which previously computed
  * `zip_with(emb, cent, (x,y) -> x - y)` (an INTERPRETED HOF that
  * allocates one difference array per row) followed by the codegen'd
  * `graft_dot(__dv, __dv)`.
  *
  * Arithmetic is BIT-IDENTICAL to that chain: the fused loop computes
  * `d = x_i − y_i; acc += d·d` in the same element order with the same
  * intermediate doubles as graft_dot's `acc += dv_i · dv_i` over the
  * zip_with output, so every query result is byte-identical (and the
  * DuckDB oracle twins are untouched). These sites are broadcast-
  * bounded — n·|labels| rows, not the IVF family's n·kCent — so the
  * win is modest; the A/B that motivated shipping it anyway is in
  * BENCHLOG round 13 (sf1: q355 2.19 → measured-after, q347 1.93 →
  * measured-after).
  *
  * NULL contract matches the replaced chain: length mismatch
  * (zip_with's null padding → null product → null sum in graft_dot) or
  * any null element → NULL.
  */
case class SqDistDouble(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_sqdist_d requires (array<double>, array<double>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_sqdist_d"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $s += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistDouble =
    copy(left = newLeft, right = newRight)
}
