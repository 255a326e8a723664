package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL front door for graft's native expressions — plug in with
  *
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions
  *
  * (a STATIC conf: it must reach a NEW SparkContext; in an existing JVM
  * use `.withExtensions(new GraftExtensions)` on the session builder),
  * after which plain SQL users get the codegen'd vector kernel without
  * touching the Scala API:
  *
  *   SELECT vector_dot(embedding, query_vec) FROM embeddings
  *
  * Registration through [[SparkSessionExtensions]] (not
  * `spark.udf.register`) keeps the function a real Catalyst expression:
  * it participates in whole-stage codegen, constant folding, and null
  * propagation like any built-in, instead of being an opaque UDF call.
  *
  * Also injects [[VectorDotRewrite]], so even the composable
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0d, (acc,e) -> acc+e)`
  * spelling compiles down to the native kernel.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vector_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"vector_dot takes exactly 2 arguments, got ${children.length}")
        DotProduct(children.head, children(1))
      }))
    ext.injectOptimizerRule(_ => VectorDotRewrite)
  }
}
