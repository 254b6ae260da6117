package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * Replaces the `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, ...)` HOF
  * chain in the similarity operators: the HOF materializes an
  * intermediate array per row pair and walks lambda closures, which
  * dominates brute-force kNN cost (measured 34 s → ~4 s at sf0.1 for
  * q26). This expression is a tight codegen'd loop over the two
  * ArrayData buffers — no allocation, stays inside whole-stage codegen.
  *
  * Summation is sequential left-to-right, bit-identical to the HOF form
  * and to DuckDB's list_dot_product — required for oracle hash parity.
  *
  * (SURVEY §7.4: "promote to custom Expression (codegen) only if
  * q26/bench demands" — it did.)
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires (array<double>, array<double>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }

  override def dataType: DataType = DoubleType

  // Always nullable: length mismatch / null elements yield NULL even
  // when both child arrays are non-nullable — the inherited
  // children-derived nullability would let projections skip the null
  // bit and materialize 0.0 instead of NULL.
  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  // Length mismatch or a null element yields NULL — matching the
  // zip_with/aggregate HOF chain this expression replaced (null-padded
  // zip → null product → null sum), so corrupt vectors surface instead
  // of silently contributing a truncated partial dot.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
