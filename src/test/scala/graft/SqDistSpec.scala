package graft

import org.apache.spark.sql.functions._

/** graft_sqdist — the codegen'd integer squared-L2 that replaced the
  * interpreted zip_with/aggregate HOF chain in every trained-IVF
  * distance sweep — must be BIT-IDENTICAL to that chain, including its
  * NULL contract (length mismatch or any null element → NULL, never a
  * truncated partial sum), in both codegen and interpreted evaluation.
  */
class SqDistSpec extends SparkSpec {
  import spark.implicits._

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), " +
      "0L, (acc, v) -> acc + v)"

  test("graft_sqdist == the zip_with/aggregate chain on well-formed " +
    "vectors, including the ppm magnitude bound") {
    graft.plans.GraftExtensions.register(spark)
    val df = Seq(
      (Seq(0L, 0L), Seq(3L, 4L)),
      (Seq(1000000L, -1000000L), Seq(-1000000L, 1000000L)),
      (Seq.fill(64)(2000000L), Seq.fill(64)(-2000000L)), // the doc'd bound
      (Seq(7L), Seq(7L))
    ).toDF("a", "b")
    val out = df.select(expr("graft_sqdist(a, b)").as("n"),
      expr(hof).as("h")).collect()
    assert(out.forall(r => r.getLong(0) == r.getLong(1)))
    assert(out(0).getLong(0) == 25L)
    assert(out(2).getLong(0) == 64L * 4000000L * 4000000L)
    assert(out(3).getLong(0) == 0L)
  }

  test("NULL contract matches the HOF: length mismatch and null " +
    "elements dead-letter, in codegen AND interpreted eval") {
    graft.plans.GraftExtensions.register(spark)
    val df = Seq(
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](1L)), // mismatch
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](1L, 2L)),
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](null, 2L))
    ).toDF("a", "b")
    val out = df.select(expr("graft_sqdist(a, b)").as("n"),
      expr(hof).as("h")).collect()
    assert(out.forall(r => r.isNullAt(0) && r.isNullAt(1)))
    // interpreted path (eval, not doGenCode): drive the expression
    // directly through a literal-free filter that codegen can't
    // constant-fold, then force interpreted projection via the
    // expression's own eval on collected rows
    import graft.functions.SqDistLong
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    def lit(xs: Seq[Any]) =
      Literal(ArrayData.toArrayData(xs.toArray), ArrayType(LongType))
    assert(SqDistLong(lit(Seq(1L, 2L)), lit(Seq(1L))).eval(null) == null)
    assert(SqDistLong(lit(Seq(1L, null)), lit(Seq(1L, 2L))).eval(null) == null)
    assert(SqDistLong(lit(Seq(3L, 4L)), lit(Seq(0L, 0L))).eval(null) == 25L)
  }

  private val hofD =
    "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), " +
      "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"

  test("graft_sqdist_d (the double variant at the cluster-quality " +
    "sites) is bit-identical to its zip_with chain incl. NULL contract") {
    graft.plans.GraftExtensions.register(spark)
    val df = Seq(
      (Seq(0.0, 0.0), Seq(3.0, 4.0)),
      (Seq(0.1, -0.2, 0.3), Seq(-0.3, 0.2, -0.1)),
      (Seq.fill(64)(1.0 / 3), Seq.fill(64)(-2.0 / 7)),
      (Seq(7.5), Seq(7.5))
    ).toDF("a", "b")
    val out = df.select(expr("graft_sqdist_d(a, b)").as("n"),
      expr(hofD).as("h")).collect()
    // exact double equality — same ops in the same order, by design
    assert(out.forall(r =>
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
    assert(out(0).getDouble(0) == 25.0)
    val nulls = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0)),
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0))
    ).toDF("a", "b")
      .select(expr("graft_sqdist_d(a, b)").as("n"), expr(hofD).as("h"))
      .collect()
    assert(nulls.forall(r => r.isNullAt(0) && r.isNullAt(1)))
    import graft.functions.SqDistDouble
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def litD(xs: Seq[Any]) =
      Literal(ArrayData.toArrayData(xs.toArray), ArrayType(DoubleType))
    assert(SqDistDouble(litD(Seq(1.0, 2.0)), litD(Seq(1.0))).eval(null) == null)
    assert(SqDistDouble(litD(Seq(1.0, null)), litD(Seq(1.0, 2.0))).eval(null) == null)
    assert(SqDistDouble(litD(Seq(3.0, 4.0)), litD(Seq(0.0, 0.0))).eval(null) == 25.0)
  }
}
