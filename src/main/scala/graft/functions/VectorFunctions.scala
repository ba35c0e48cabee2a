package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the hot vector kernel: a float-array
  * dot product evaluated directly over Tungsten `ArrayData` — no
  * intermediate array materialization, unlike the
  * `aggregate(zip_with(...))` higher-order-function chain which builds a
  * boxed result array per row. Left-to-right accumulation, matching the
  * SQL/DuckDB folds used by the oracle-checked queries bit-for-bit.
  * Generates real Java (doGenCode), so surrounding operators keep
  * whole-stage codegen — a CodegenFallback here would force every
  * signature/scoring projection that embeds it into interpreted mode.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // the fold lives in its OWN generated method: projections embed
    // this expression up to 32x per row (q48's signature), and inlining
    // the loop each time makes one huge method HotSpot refuses to JIT
    // (measured: q48 0.6 s -> 1.0 s with inline bodies)
    val dot = ctx.addNewFunction("graftDotProduct",
      s"""
      private double graftDotProduct(org.apache.spark.sql.catalyst.util.ArrayData x, org.apache.spark.sql.catalyst.util.ArrayData y) {
        final int n = java.lang.Math.min(x.numElements(), y.numElements());
        double acc = 0.0;
        // same left-to-right double fold as nullSafeEval — generated
        // and interpreted paths must stay bit-identical
        for (int i = 0; i < n; i++) {
          acc += (double) x.getFloat(i) * (double) y.getFloat(i);
        }
        return acc;
      }""")
    nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = $dot($x, $y);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Count of common elements between two SORTED long arrays (set
  * semantics expected upstream): one O(|a|+|b|) merge pass directly over
  * Tungsten `ArrayData`. This is the per-pair verify kernel of the exact
  * Jaccard join (q50): with per-document sorted gram-hash arrays, each
  * candidate pair costs one fixed-width pass — versus the relational
  * intersect-count join, whose candidates×grams row explosion was
  * measured at 200M intermediate rows (7 s of a 9.7 s query) at sf0.1.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects array<bigint> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var (i, j) = (0, 0)
    var acc = 0L
    while (i < nx && j < ny) {
      // null elements never match (the type check admits
      // containsNull=true arrays, and getLong on a null slot would read
      // an arbitrary value — SQL callers can pass array(NULL, ...))
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val (xv, yv) = (x.getLong(i), y.getLong(j))
        if (xv == yv) { acc += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // own generated method, not inlined — see DotProduct.doGenCode
    val merge = ctx.addNewFunction("graftSortedIntersect",
      s"""
      private long graftSortedIntersect(org.apache.spark.sql.catalyst.util.ArrayData x, org.apache.spark.sql.catalyst.util.ArrayData y) {
        final int nx = x.numElements();
        final int ny = y.numElements();
        int i = 0; int j = 0;
        long acc = 0L;
        // mirrors nullSafeEval exactly, including the null-slot skips
        while (i < nx && j < ny) {
          if (x.isNullAt(i)) { i++; }
          else if (y.isNullAt(j)) { j++; }
          else {
            final long xv = x.getLong(i);
            final long yv = y.getLong(j);
            if (xv == yv) { acc++; i++; j++; }
            else if (xv < yv) { i++; }
            else { j++; }
          }
        }
        return acc;
      }""")
    nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = $merge($x, $y);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** float×double variant of [[DotProduct]] for the centroid-scoring hot
  * path: every cosine assignment folds a float embedding against a
  * double centroid (`aggregate(zip_with(emb, cv, (x, y) -> CAST(x AS
  * DOUBLE) * y), 0e0, (a, y) -> a + y)`), and that HOF chain — run
  * inside the CodegenFallback `transform` lambda of the row-local
  * argmax — materializes a boxed 64-element array and dispatches two
  * lambdas per element, per centroid, per row. This expression is the
  * identical left-to-right IEEE fold (`acc += (double)x[i] * y[i]`) as
  * one tight loop over Tungsten `ArrayData`; inside an interpreted HOF
  * lambda it runs via nullSafeEval, still one virtual call per
  * CENTROID instead of four per ELEMENT. Generated and interpreted
  * paths stay bit-identical to each other and to the HOF fold they
  * replace (same accumulation order, same double widening). */
case class DotProductFD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) => true
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_fd expects (array<float>, array<double>) inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // own generated method, not inlined — see DotProduct.doGenCode
    val dot = ctx.addNewFunction("graftDotProductFD",
      s"""
      private double graftDotProductFD(org.apache.spark.sql.catalyst.util.ArrayData x, org.apache.spark.sql.catalyst.util.ArrayData y) {
        final int n = java.lang.Math.min(x.numElements(), y.numElements());
        double acc = 0.0;
        // same left-to-right double fold as nullSafeEval — generated
        // and interpreted paths must stay bit-identical
        for (int i = 0; i < n; i++) {
          acc += (double) x.getFloat(i) * y.getDouble(i);
        }
        return acc;
      }""")
    nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = $dot($x, $y);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFD =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  def dot(a: Column, b: Column): Column =
    bridge.column(DotProduct(bridge.expression(a), bridge.expression(b)))

  def dotFD(a: Column, b: Column): Column =
    bridge.column(DotProductFD(bridge.expression(a), bridge.expression(b)))

  def sortedIntersectCount(a: Column, b: Column): Column =
    bridge.column(SortedIntersectCount(
      bridge.expression(a), bridge.expression(b)))

  /** Cosine similarity from three dot products (norms not cached). */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }
}
