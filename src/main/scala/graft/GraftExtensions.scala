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
        GraftExtensions.dotBuilder(children)))
  }
}

object GraftExtensions {
  /** Arity-checked builder: a wrong argument count must surface as an
    * analysis-time error naming the function, not an
    * IndexOutOfBoundsException from children(1). */
  private[graft] def dotBuilder(
      children: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : DotProduct = {
    if (children.length != 2)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "dot_product",
          "expectedNum" -> "2",
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    DotProduct(children(0), children(1))
  }

  /** Register on an already-built session (extensions configured via
    * `spark.sql.extensions` only apply at session construction — a
    * getOrCreate that returns an existing session ignores them). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", dotBuilder, "built-in")
}
