package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProduct

/** Engine extensions, registered via the public
  * `SparkSessionExtensions` hook
  * (`.config("spark.sql.extensions", "graft.plans.GraftExtensions")`)
  * or post-hoc with [[GraftExtensions.register]] for sessions the
  * engine does not construct.
  *
  * Currently one native function:
  *   graft_dot(array<double>, array<double>) → double   (codegen'd)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.dotFunction)
}

object GraftExtensions {
  private val dotFunction = (
    new FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => DotProduct(children(0), children(1)))

  /** Idempotent in-session registration — lets library entry points
    * guarantee the function exists regardless of how the session was
    * built.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      dotFunction._1, dotFunction._2, dotFunction._3)
}
