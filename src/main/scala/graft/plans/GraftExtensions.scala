package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

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

  /** Buffer-sizing arguments must be integer literals (they shape the
    * aggregation buffer, which cannot vary per row). SQL integer
    * literals wide enough to parse as BIGINT arrive as Long. */
  private def intLitArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) if v.isValidInt => v.toInt
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // the native as-of join planner rule — sessions built with these
    // extensions plan AsOfJoinNode without the lazy extraStrategies
    // registration that AsOfJoinNative.asof performs
    ext.injectPlannerStrategy(_ => AsOfJoinNative.AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vector_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"vector_dot takes exactly 2 arguments, got ${children.length}")
        DotProduct(children.head, children(1))
      }))
    ext.injectOptimizerRule(_ => VectorDotRewrite)
    // simhash_fold(array<bigint>) — the native 64-bit SimHash vote fold
    // over pre-hashed tokens (pair with Spark's own xxhash64 inside a
    // transform: simhash_fold(transform(toks, t -> xxhash64(t)))).
    ext.injectFunction((
      FunctionIdentifier("simhash_fold"),
      new ExpressionInfo(classOf[SimHashFold].getName, "simhash_fold"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"simhash_fold takes exactly 1 argument, got ${children.length}")
        SimHashFold(children.head)
      }))
    // heavy_hitters(col, capacity, k) — the SpaceSaving aggregate as a
    // SQL function; capacity/k must be integer literals (they size the
    // aggregation buffer, which cannot vary per row).
    ext.injectFunction((
      FunctionIdentifier("heavy_hitters"),
      new ExpressionInfo(classOf[HeavyHittersAgg].getName, "heavy_hitters"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"heavy_hitters takes (col, capacity, k), got ${children.length} arguments")
        HeavyHittersAgg(children.head,
          intLitArg(children(1), "heavy_hitters capacity"),
          intLitArg(children(2), "heavy_hitters k"))
      }))
    // bloom_build(longCol, expectedItems[, fpp]) — the un-clamped bloom
    // index build (see BloomIndex); sizing must be literal (it shapes
    // the aggregation buffer). Probe via Spark's own `might_contain`.
    ext.injectFunction((
      FunctionIdentifier("bloom_build"),
      new ExpressionInfo(classOf[BloomBuildAgg].getName, "bloom_build"),
      (children: Seq[Expression]) => {
        require(children.length == 2 || children.length == 3,
          s"bloom_build takes (col, expectedItems[, fpp]), got ${children.length} arguments")
        val items = children(1) match {
          case Literal(v: Long, _) => v
          case Literal(v: Int, _) => v.toLong
          case other => throw new IllegalArgumentException(
            s"bloom_build expectedItems must be an integer literal, got $other")
        }
        val fpp = children.lift(2).map {
          case Literal(v: Double, _) => v
          // SQL fractional literals parse as DECIMAL, not DOUBLE — the
          // documented `bloom_build(c, n, 0.03)` spelling must work
          case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
          case other => throw new IllegalArgumentException(
            s"bloom_build fpp must be a numeric literal, got $other")
        }.getOrElse(0.03)
        BloomBuildAgg(children.head, items, fpp)
      }))
    // cms_sketch(col, depth, width) / cms_estimate(sketch, key, depth,
    // width) — the Count-Min pair (see CountMinAgg); dims must be
    // integer literals (they size the aggregation buffer) and must match
    // between build and probe.
    ext.injectFunction((
      FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[CountMinAgg].getName, "cms_sketch"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"cms_sketch takes (col, depth, width), got ${children.length} arguments")
        CountMinAgg(children.head,
          intLitArg(children(1), "cms_sketch depth"),
          intLitArg(children(2), "cms_sketch width"))
      }))
    ext.injectFunction((
      FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CountMinEstimate].getName, "cms_estimate"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          s"cms_estimate takes (sketch, key, depth, width), got ${children.length} arguments")
        CountMinEstimate(children.head, children(1),
          intLitArg(children(2), "cms_estimate depth"),
          intLitArg(children(3), "cms_estimate width"))
      }))
    // cms_join_est(sketchA, sketchB, depth, width) — equi-join
    // cardinality estimate from two same-geometry sketches (row-min of
    // row-wise inner products): the planner-style "how big would this
    // join be" answer from two few-KB summaries, no relation touched.
    ext.injectFunction((
      FunctionIdentifier("cms_join_est"),
      new ExpressionInfo(classOf[CountMinJoinSize].getName, "cms_join_est"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          s"cms_join_est takes (sketchA, sketchB, depth, width), got ${children.length} arguments")
        CountMinJoinSize(children.head, children(1),
          intLitArg(children(2), "cms_join_est depth"),
          intLitArg(children(3), "cms_join_est width"))
      }))
    // might_contain(bloomBinary, longCol) — Spark ships this expression
    // for its internal runtime join filters but does NOT register it as
    // a SQL function; expose it so the bloom loop closes in plain SQL.
    // The bloom argument must be foldable or a scalar subquery (the
    // expression enforces it) — exactly how a stored index is used.
    ext.injectFunction((
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"might_contain takes (bloom, value), got ${children.length} arguments")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))
      }))
  }
}
