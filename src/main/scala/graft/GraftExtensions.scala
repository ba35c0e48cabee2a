package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.DotProduct

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for SQL callers
  * (`SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`).
  *
  * Deliberately small: the reference has no optimizer to port (SURVEY
  * §4.2 — custom Rule/SparkStrategy would be invented complexity), so
  * the extension surface is just function registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(children(0), children(1))))
  }
}

object GraftExtensions {
  /** Register on an already-built session (extensions configured via
    * `spark.sql.extensions` only apply at session construction — a
    * getOrCreate that returns an existing session ignores them). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
}
