package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native ranged dot product: `graft_dot_range(a, b, start, len)` =
  * Σ a[i]·b[i] over the 1-based window [start, start+len) of two
  * `array<double>` columns — the zero-allocation replacement for
  * `graft_dot(slice(a, start, len), slice(b, start, len))`, which
  * copies both windows into fresh arrays per row (per PAIR in the
  * similarity operators, where this runs inside a candidate join).
  *
  * Summation is sequential left-to-right within the window, so for
  * prefixes (start = 1) the result is bit-identical to the sliced
  * [[DotProduct]] form and to DuckDB's
  * `list_dot_product(a[1:len], b[1:len])` — required for oracle hash
  * parity.
  *
  * `start` and `len` must be foldable (literal) ints: they fold into
  * the generated loop bounds, keeping the whole expression inside
  * whole-stage codegen with no per-row bound evaluation.
  */
case class DotRange(vecA: Expression, vecB: Expression,
                    start: Expression, len: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(vecA, vecB, start, len)

  override def checkInputDataTypes(): TypeCheckResult =
    (vecA.dataType, vecB.dataType, start.dataType, len.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _),
          IntegerType, IntegerType) =>
        if (!(start.foldable && len.foldable))
          TypeCheckResult.TypeCheckFailure(
            "graft_dot_range requires literal start/len")
        else (start.eval(), len.eval()) match {
          // Validate the folded window HERE, not at eval time: a
          // start<1 would index UnsafeArrayData at negative offsets
          // (silent garbage), and a len near Int.MaxValue overflows
          // s0+l0 so the bounds check passes and the loop never runs
          // (silent 0.0). 1-based start mirrors DuckDB list slicing.
          case (null, _) | (_, null) => TypeCheckResult.TypeCheckFailure(
            "graft_dot_range requires non-null start/len")
          case (s: Integer, l: Integer) =>
            if (s < 1) TypeCheckResult.TypeCheckFailure(
              s"graft_dot_range start must be >= 1 (1-based), got $s")
            else if (l < 0) TypeCheckResult.TypeCheckFailure(
              s"graft_dot_range len must be >= 0, got $l")
            else if (s.toLong - 1L + l.toLong > Int.MaxValue)
              TypeCheckResult.TypeCheckFailure(
                s"graft_dot_range window end start-1+len=${s.toLong - 1L + l.toLong} exceeds Int range")
            else TypeCheckResult.TypeCheckSuccess
          case _ => TypeCheckResult.TypeCheckFailure(
            "graft_dot_range start/len must fold to ints")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_dot_range requires (array<double>, array<double>, int, int)")
    }

  override def dataType: DataType = DoubleType

  // NULL on a null array, a window exceeding either array, or a null
  // element inside the window — the slice-then-dot contract (slice
  // past the end shortens the window and graft_dot then nulls on the
  // length mismatch; here the window is fixed, so exceeding = null).
  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot_range"

  private lazy val s0: Int = start.eval().asInstanceOf[Int] - 1
  private lazy val l0: Int = len.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val a = vecA.eval(input)
    val b = vecB.eval(input)
    if (a == null || b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() < s0 + l0 || y.numElements() < s0 + l0) return null
    var s = 0.0
    var i = s0
    while (i < s0 + l0) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val a = vecA.genCode(ctx)
    val b = vecB.genCode(ctx)
    val i = ctx.freshName("i")
    val s = ctx.freshName("s")
    val hi = s0 + l0
    ev.copy(code =
      code"""
        |${a.code}
        |${b.code}
        |boolean ${ev.isNull} = true;
        |double ${ev.value} = 0.0;
        |if (!${a.isNull} && !${b.isNull} &&
        |    ${a.value}.numElements() >= $hi &&
        |    ${b.value}.numElements() >= $hi) {
        |  ${ev.isNull} = false;
        |  double $s = 0.0;
        |  for (int $i = $s0; $i < $hi; $i++) {
        |    if (${a.value}.isNullAt($i) || ${b.value}.isNullAt($i)) {
        |      ${ev.isNull} = true; break;
        |    }
        |    $s += ${a.value}.getDouble($i) * ${b.value}.getDouble($i);
        |  }
        |  if (!${ev.isNull}) { ${ev.value} = $s; }
        |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DotRange =
    copy(vecA = newChildren(0), vecB = newChildren(1),
      start = newChildren(2), len = newChildren(3))
}
