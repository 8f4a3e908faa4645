package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: exact integer dot product of two
  * `array<bigint>` columns.
  *
  * Why a custom Expression (SURVEY.md §7.3 escalation ladder, tier b):
  * the composable form — `aggregate(zip_with(a, b, _*_), 0L, _+_)` — runs
  * through Catalyst's higher-order-function machinery, which allocates a
  * lambda frame per element and stays OUTSIDE whole-stage codegen. On the
  * similarity-search hot path this expression is evaluated per candidate
  * pair × per dimension (millions × 64 at bench scale, billions at 100 TB),
  * so it gets a `doGenCode` that compiles to a tight primitive loop inside
  * the generated stage. Semantics are identical to the composable form on
  * non-null inputs (exact long arithmetic, order-insensitive), so DuckDB
  * oracles are unaffected.
  *
  * Null handling: null array → null result (nullIntolerant); null ELEMENTS
  * are not expected (quantization produces non-null values) and read as 0.
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // return type inferred: types.AbstractDataType is private[sql]
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "long_array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // All locals via freshName: a bare `i` collides with variables already in
    // scope when the expression inlines into a larger whole-stage function
    // (janino "Redefinition of local variable" → silent interpreted fallback).
    val n = ctx.freshName("n")
    val acc = ctx.freshName("acc")
    val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}

object LongArrayDot {
  /** Column-level entry point. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      LongArrayDot(GraftBridge.expression(a), GraftBridge.expression(b)))
  }
}
