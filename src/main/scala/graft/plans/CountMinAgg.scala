package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a native Catalyst
  * aggregate plus a codegen'd point-query expression — the POINT-QUERY
  * counterpart to [[HeavyHittersAgg]]: SpaceSaving answers "which items
  * are frequent", the CMS answers "how often did THIS item occur" for
  * any item decided AFTER the scan, from the same fixed-size summary.
  *
  * The sketch is a depth×width counter matrix; each update increments
  * one counter per row (row-seeded Murmur hash of the key), an estimate
  * is the MINIMUM over a key's depth counters. Collisions only ever ADD,
  * so estimates are overestimates: est ≥ true, and est ≤ true + 2n/width
  * with probability 1 − 2⁻ᵈᵉᵖᵗʰ (n = stream length) — the guarantee
  * `CmsSpec` pins empirically.
  *
  * The 100 TB point is the same as every sketch in this tier: the
  * partial-aggregate state is FIXED at depth×width longs per group per
  * partition regardless of how many distinct keys stream past, and merge
  * is elementwise addition — unconditionally associative/commutative, so
  * any merge tree (map-side combine, AQE re-partitioning, hierarchical
  * reduce) yields the identical sketch. Estimating a key against a
  * group's sketch is then a broadcast-join-shaped probe: sketches are a
  * few KB per group, shipped to wherever the query keys live.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes {

  require(depth > 0 && width > 0, s"need positive dims, got $depth x $width")

  override def prettyName: String = "cms_sketch"
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      var r = 0
      while (r < depth) {
        buf(r * width + CountMin.bucket(bytes, r, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8 + 4)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Point query against a CMS sketch column: min over the key's depth
  * counters. Codegen'd via a static kernel call so probes stay inside
  * whole-stage codegen (the probe side is usually keys × groups — small,
  * but it sits in the middle of a joined plan and must not break the
  * codegen span). */
case class CountMinEstimate(left: Expression, right: Expression, depth: Int, width: Int)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def nullSafeEval(sketch: Any, key: Any): Any =
    CountMin.estimate(sketch.asInstanceOf[ArrayData],
      key.asInstanceOf[UTF8String], depth, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, k) => s"graft.plans.CountMin.estimate($s, $k, $depth, $width)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Join-size estimate from two CMS sketches of the SAME geometry: the
  * minimum over rows of the row-wise inner product (Cormode &
  * Muthukrishnan 2005 §4.2). For relations A and B joined on the
  * sketched key, the true size is Σ_key fA(key)·fB(key); every row's
  * inner product overcounts it by hash collisions only (products of
  * counts are non-negative), so the row-min is ≥ the truth with
  * expected slack ‖A‖₁·‖B‖₁/width per row — the classic
  * cardinality-estimation primitive a planner consults before choosing
  * a join strategy, here answerable from two already-built few-KB
  * summaries WITHOUT touching either relation. Row seeds are the row
  * index, so any two sketches built by [[CountMinAgg]] with equal
  * (depth, width) are directly comparable. */
case class CountMinJoinSize(left: Expression, right: Expression, depth: Int, width: Int)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_join_est"

  override def nullSafeEval(a: Any, b: Any): Any =
    CountMin.joinSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], depth, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.CountMin.joinSize($a, $b, $depth, $width)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CountMin {
  import org.apache.spark.sql.{Column, GraftColumnBridge}

  /** Row-seeded hash bucket. Murmur3 over raw UTF-8 bytes: stable
    * across JVMs and partitions, no per-key String allocation. */
  def bucket(keyBytes: Array[Byte], row: Int, width: Int): Int =
    Math.floorMod(MurmurHash3.bytesHash(keyBytes, row), width)

  /** Geometry guard shared by both probe kernels: a sketch built with
    * different (depth, width) literals than the probe would silently
    * read wrong offsets (an under-length array instead throws an opaque
    * ArrayIndexOutOfBounds inside generated code) — fail loud with the
    * mismatch spelled out. */
  private def checkGeometry(sketch: ArrayData, depth: Int, width: Int, op: String): Unit =
    if (sketch.numElements() != depth * width)
      throw new IllegalArgumentException(
        s"$op: sketch geometry mismatch — probe expects depth=$depth x width=$width " +
          s"(${depth * width} counters) but the sketch has ${sketch.numElements()}; " +
          "build and probe must use identical (depth, width) literals")

  /** The estimate kernel shared by interpreted eval and codegen. */
  def estimate(sketch: ArrayData, key: UTF8String, depth: Int, width: Int): Long = {
    checkGeometry(sketch, depth, width, "cms_estimate")
    val bytes = key.getBytes
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = sketch.getLong(r * width + bucket(bytes, r, width))
      if (c < min) min = c
      r += 1
    }
    min
  }

  /** Column API: `sketch(col, depth, width)` → `array<long>` of
    * depth×width counters (a mergeable partial aggregate). */
  def sketch(c: Column, depth: Int, width: Int): Column =
    GraftColumnBridge.column(
      CountMinAgg(GraftColumnBridge.expression(c), depth, width)
        .toAggregateExpression())

  /** Column API: `estimateCol(sketch, key, depth, width)` → estimated
    * occurrence count of `key` in the stream the sketch summarized. */
  def estimateCol(sketch: Column, key: Column, depth: Int, width: Int): Column =
    GraftColumnBridge.column(
      CountMinEstimate(GraftColumnBridge.expression(sketch),
        GraftColumnBridge.expression(key), depth, width))

  /** The join-size kernel shared by interpreted eval and codegen. */
  def joinSize(a: ArrayData, b: ArrayData, depth: Int, width: Int): Long = {
    checkGeometry(a, depth, width, "cms_join_est(left)")
    checkGeometry(b, depth, width, "cms_join_est(right)")
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      var s = 0L
      var w = 0
      while (w < width) {
        s += a.getLong(r * width + w) * b.getLong(r * width + w)
        w += 1
      }
      if (s < min) min = s
      r += 1
    }
    min
  }

  /** Column API: `joinSizeCol(a, b, depth, width)` → estimated
    * equi-join cardinality of the two sketched key streams. */
  def joinSizeCol(a: Column, b: Column, depth: Int, width: Int): Column =
    GraftColumnBridge.column(
      CountMinJoinSize(GraftColumnBridge.expression(a),
        GraftColumnBridge.expression(b), depth, width))
}
