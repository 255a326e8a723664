package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ImplicitCastInputTypes, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom membership index over a column — the fixed-size "have we seen
  * this content before?" primitive a 100 TB ingest pipeline keeps
  * between runs.
  *
  * The build is one distributed aggregation: each partition fills a
  * local sketch, partials OR together (mergeable — union is bitwise),
  * and only the final bitmap reaches the driver. The probe is a
  * map-side predicate on the new batch — no shuffle, no join, no corpus
  * re-scan. False positives are possible, false negatives are not, so:
  *
  *  - `mightContain = false` ⇒ DEFINITELY unseen — the common case for
  *    fresh content can skip the exact check entirely;
  *  - `mightContain = true` ⇒ maybe seen — only these rows (true dups +
  *    the configured false-positive tail) reach the exact verification
  *    join.
  *
  * That split turns "anti-join a daily batch against the whole corpus"
  * into "scan the batch once against a bitmap, then exact-join a sliver"
  * — the corpus is touched only at build time, and day-over-day the
  * index is maintained by [[BloomIndex.union]]-ing the new day's sketch
  * in, never rebuilt.
  *
  * The build aggregate is graft's own ([[BloomBuildAgg]]) rather than
  * Spark's `BloomFilterAggregate`: Spark's is built for its automatic
  * runtime JOIN filters and silently clamps sizing to
  * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` / `maxNumBits`
  * (4M items / 8 MB by default) — at corpus scale the clamp would blow
  * the fp rate up and quietly degrade the "sliver" exact join back to a
  * corpus-sized one. This aggregate sizes exactly as asked; the cost is
  * explicit too (each partial buffer holds the full bitmap, so size the
  * fpp/items product to executor memory). The serialized format is the
  * sketch library's own, so the PROBE still uses Spark's native
  * `BloomFilterMightContain` (codegen'd) unchanged.
  */
object BloomIndex {

  /** Aggregate a long-typed column (hash your content first — e.g.
    * `xxhash64(text)`) into a serialized bloom filter sized for
    * `expectedItems` at `fpp` (default 3%, matching Spark's own). */
  def bloomAgg(c: Column, expectedItems: Long, fpp: Double = 0.03): Column =
    GraftColumnBridge.column(
      BloomBuildAgg(GraftColumnBridge.expression(c), expectedItems, fpp)
        .toAggregateExpression())

  /** Map-side membership probe of a previously-built index. The sketch
    * embeds in the plan as a literal — the broadcast-equivalent for a
    * driver-held artifact of a few MB. */
  def mightContain(index: Array[Byte], c: Column): Column =
    GraftColumnBridge.column(
      BloomFilterMightContain(Literal(index, BinaryType),
        GraftColumnBridge.expression(c)))

  /** Incremental maintenance: OR a newer sketch into an existing one.
    * Both must have been built with the same sizing. */
  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val fa = BloomFilter.readFrom(new java.io.ByteArrayInputStream(a))
    val fb = BloomFilter.readFrom(new java.io.ByteArrayInputStream(b))
    fa.mergeInPlace(fb)
    val out = new java.io.ByteArrayOutputStream()
    fa.writeTo(out)
    out.toByteArray
  }
}

/** Un-clamped bloom build over long inputs (see [[BloomIndex]] for why
  * Spark's own aggregate doesn't fit). Nulls are skipped; an all-null /
  * empty group yields an empty filter that answers `false` everywhere —
  * the correct "nothing seen yet" index. */
case class BloomBuildAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with ImplicitCastInputTypes {

  require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
  require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")

  override def prettyName: String = "bloom_build"
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    buf.mergeInPlace(other) // same (items, fpp) ⇒ compatible bit arrays
    buf
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
