package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, DotProductFD, SortedIntersectCount}

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
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.registry.foreach { case (name, clazz, builder) =>
      e.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        builder))
    }
}

object GraftExtensions {
  /** Arity-checked builder: a wrong argument count must surface as an
    * analysis-time error naming the function, not an
    * IndexOutOfBoundsException from children(1). */
  private def binary(name: String, make: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = { children =>
    if (children.length != 2)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name,
          "expectedNum" -> "2",
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    make(children(0), children(1))
  }

  private[graft] val dotBuilder: Seq[Expression] => Expression =
    binary("dot_product", DotProduct.apply)

  private[graft] val dotFdBuilder: Seq[Expression] => Expression =
    binary("dot_fd", DotProductFD.apply)

  private[graft] val sicBuilder: Seq[Expression] => Expression =
    binary("sorted_intersect_count", SortedIntersectCount.apply)

  private val registry: Seq[(String, Class[_], Seq[Expression] => Expression)] =
    Seq(
      ("dot_product", classOf[DotProduct], dotBuilder),
      ("dot_fd", classOf[DotProductFD], dotFdBuilder),
      ("sorted_intersect_count", classOf[SortedIntersectCount], sicBuilder))

  /** Register on an already-built session (extensions configured via
    * `spark.sql.extensions` only apply at session construction — a
    * getOrCreate that returns an existing session ignores them). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    registry.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
