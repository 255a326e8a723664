package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native vector expressions — the "custom Catalyst `Expression` where
  * the built-ins are the bottleneck" tier (SURVEY §7.3's documented
  * upgrade path).
  *
  * The composable formulation (`aggregate(zip_with(a, b, _*_), 0, _+_)`)
  * materializes an intermediate array per invocation; at N² pair volume
  * (near-dup scans, brute-force top-k) the allocation dominates the
  * arithmetic. [[DotProduct]] generates a tight allocation-free loop
  * inside whole-stage codegen, with an identical left-to-right fold
  * order — results are bit-equal to the composed version, so oracle
  * parity is unaffected.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Callers (VectorExprs.dot) cast both sides to array<double>; no
  // implicit-coercion contract needed here.
  override def dataType: DataType = DoubleType

  override def prettyName: String = "vector_dot"

  // Note: element nulls are not expected (embedding vectors are dense);
  // a null element reads as 0.0, matching zip_with's null→null product
  // only when absent — callers must not pass arrays with null entries.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column-level API for [[DotProduct]]. Inputs are implicitly cast to
    * `array<double>` by the expression's input-type contract. */
  def vectorDot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
