package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** All `seeds` Kirsch–Mitzenmacher MinHash minima in ONE aggregation
  * buffer — the native replacement for `seeds` separate
  * `min(pmod(h1 + i·h2, p))` aggregate expressions on the LSH fast
  * path.
  *
  * Functionally identical to the 20-agg formulation (spec-pinned
  * row-for-row): per input row the i-th signature candidate is
  * `(h1 + i·h2) mod p`, and the buffer keeps the running minimum per
  * seed. What the fusion buys at scale: one aggregate function instead
  * of 20 means one buffer lookup/update per row (a tight primitive
  * long-array loop, no per-seed expression-tree evaluation), one
  * serialized value through the partial-aggregate shuffle instead of 20
  * columns, and one merge loop. Inputs are the pre-reduced base hashes
  * (both < p < 2⁵³), so `h1 + (seeds−1)·h2 < 20·2⁵⁰` — the candidate
  * arithmetic cannot overflow a long and `%` equals `pmod` on these
  * non-negative values, which is what makes the native loop
  * bit-identical to the column formulation.
  *
  * Only the xxhash64 FAST path uses this (its md5 twin keeps the
  * column formulation the DuckDB oracle mirrors term-for-term — an
  * oracle cannot see inside a native buffer).
  */
case class MinHashSigsAgg(
    h1: Expression,
    h2: Expression,
    seeds: Int,
    prime: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes {

  require(seeds > 0 && prime > 0, s"need positive dims, got $seeds seeds mod $prime")

  override def prettyName: String = "minhash_sigs"
  override def children: Seq[Expression] = Seq(h1, h2)
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(seeds)(Long.MaxValue)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val a = h1.eval(row)
    val b = h2.eval(row)
    if (a != null && b != null) {
      // reduce both once so the incremental step's single conditional
      // subtract is sufficient (cand < p, step < p ⇒ cand + step < 2p);
      // (a%p + i·(b%p)) mod p ≡ (a + i·b) mod p, so this stays
      // bit-identical to the column formulation for ANY long inputs
      val av = java.lang.Math.floorMod(a.asInstanceOf[Long], prime)
      val bv = java.lang.Math.floorMod(b.asInstanceOf[Long], prime)
      var i = 0
      var cand = av
      while (i < seeds) {
        if (cand < buf(i)) buf(i) = cand
        // incremental: (a + (i+1)·b) ≡ (cand + b) mod p — one add and
        // one conditional subtract per seed instead of a mul and a mod
        cand += bv
        if (cand >= prime) cand -= prime
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < seeds) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(seeds * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < seeds) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](seeds)
    var i = 0
    while (i < seeds) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSigsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSigsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(h1 = newChildren(0), h2 = newChildren(1))
}

object MinHashSigs {
  import org.apache.spark.sql.{Column, GraftColumnBridge}

  /** Column API: `sigs(h1, h2, seeds, prime)` → `array<long>` of the
    * per-seed KM minima. */
  def sigs(h1: Column, h2: Column, seeds: Int, prime: Long): Column =
    GraftColumnBridge.column(
      MinHashSigsAgg(GraftColumnBridge.expression(h1),
        GraftColumnBridge.expression(h2), seeds, prime)
        .toAggregateExpression())
}
