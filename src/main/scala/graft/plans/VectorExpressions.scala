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
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  // Declared contract, not caller convention: the Scala API casts both
  // sides, but the SQL registration (GraftExtensions) passes children
  // through raw — without this, `vector_dot(int_arr, int_arr)` passes
  // analysis and then misreads 4-byte int slots as doubles (silently
  // wrong numbers on UnsafeArrayData, ClassCastException otherwise).
  override def inputTypes: Seq[DataType] =
    Seq(org.apache.spark.sql.types.ArrayType(DoubleType),
      org.apache.spark.sql.types.ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vector_dot"

  // Exactly the semantics of `aggregate(zip_with(a,b,(x,y)=>x*y), 0d,
  // (acc,e)=>acc+e)`: a length mismatch or a null element yields NULL
  // (zip_with pads the shorter side with nulls; null poisons the sum).
  // That equivalence is what licenses [[VectorDotRewrite]] to substitute
  // this kernel for the composed form anywhere in a plan. Dense
  // equal-length embeddings never hit either branch.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
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
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
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
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
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
