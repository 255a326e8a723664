package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving (Metwally et al.) heavy-hitters sketch as a native
  * Catalyst aggregate — the frequent-items capability Spark lacks as a
  * COMPOSABLE aggregate (`df.stat.freqItems` is a whole-DataFrame
  * action: not usable per group, not mergeable, not part of a plan).
  *
  * Per aggregation buffer at most [[capacity]] counters are kept; an
  * unseen item evicts the minimum counter and inherits its count as its
  * error bound (classic single-stream guarantees: estimate ≥ true
  * count, overestimate ≤ `err`, any item with frequency > n/capacity
  * present) — with memory FIXED at the capacity regardless of how many
  * distinct items stream past. That bounded-memory property is the
  * 100 TB point: exact per-group top-k (q46-style) shuffles the whole
  * vocabulary; this shuffles at most `capacity` counters per group per
  * partition.
  *
  * When capacity exceeds the distinct-item count seen by every buffer,
  * no eviction ever happens and the sketch IS the exact counts — the
  * regime the q65 oracle pins (err = 0 proves it on the test corpus).
  *
  * Merge implements the mergeable-summaries bound (Agarwal et al.,
  * "Mergeable Summaries", PODS'12): a FULL SpaceSaving buffer is
  * equivalent to one whose absent items all carry estimate = its
  * minimum counter, so an item present in only one side is charged the
  * other side's minimum (count AND error) before the combined counters
  * are truncated back to the top `capacity` by count. Every kept
  * estimate stays ≥ the true count, `estimate − err` stays ≤ it, and a
  * truncated item's estimate is ≤ the new minimum counter — exactly the
  * floor later merges charge for it — so the single-stream guarantees
  * survive any merge tree at any skew, which is what makes the sketch
  * safe as a partial aggregate at 1000-executor scale.
  */
case class HeavyHittersAgg(
    child: Expression,
    capacity: Int,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]]
  with ImplicitCastInputTypes {

  require(capacity > 0 && k > 0 && k <= capacity,
    s"need 0 < k <= capacity, got k=$k capacity=$capacity")

  override def prettyName: String = "heavy_hitters"
  override def children: Seq[Expression] = Seq(child)
  // Declares the string contract so a non-string column is implicitly
  // cast at analysis time (or rejected there) instead of surfacing as an
  // executor ClassCastException mid-job.
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  private def evictMin(buf: mutable.HashMap[String, (Long, Long)]): (String, Long) = {
    // deterministic victim: smallest count, then smallest token
    val (vk, (vc, _)) = buf.minBy { case (t, (c, _)) => (c, t) }
    buf -= vk
    (vk, vc)
  }

  override def update(
      buf: mutable.HashMap[String, (Long, Long)],
      input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some((c, e)) => buf.update(key, (c + 1, e))
        case None if buf.size < capacity => buf.update(key, (1L, 0L))
        case None =>
          val (_, minCount) = evictMin(buf)
          buf.update(key, (minCount + 1, minCount))
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, (Long, Long)],
      other: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    // The charge a side levies on items it does not hold: its minimum
    // counter when FULL (eviction may have absorbed the item), zero when
    // not full (not full ⟹ never evicted ⟹ absent means count 0 there).
    def floor(m: mutable.HashMap[String, (Long, Long)]): Long =
      if (m.size < capacity) 0L else m.valuesIterator.map(_._1).min
    val floorBuf = floor(buf)
    val floorOther = floor(other)
    other.foreach { case (t, (c, e)) =>
      buf.get(t) match {
        case Some((c0, e0)) => buf.update(t, (c0 + c, e0 + e))
        case None => buf.update(t, (c + floorBuf, e + floorBuf))
      }
    }
    if (floorOther > 0) buf.keysIterator.filterNot(other.contains).toSeq
      .foreach { t =>
        val (c, e) = buf(t)
        buf.update(t, (c + floorOther, e + floorOther))
      }
    // Truncate to the top `capacity` counters (count desc, token asc for
    // determinism). A truncated item's estimate is ≤ every kept count,
    // i.e. ≤ the floor the NEXT merge will charge for it, so truncation
    // never breaks the ≥-true-count invariant downstream.
    if (buf.size > capacity) {
      val drop = buf.toSeq.sortBy { case (t, (c, _)) => (-c, t) }
        .drop(capacity)
      drop.foreach { case (t, _) => buf -= t }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, (Long, Long)]): Any = {
    val top = buf.toSeq
      .sortBy { case (t, (c, _)) => (-c, t) }
      .take(k)
      .map { case (t, (c, e)) =>
        InternalRow(UTF8String.fromString(t), c, e) }
    new GenericArrayData(top)
  }

  override def serialize(buf: mutable.HashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, (c, e)) =>
      // length-prefixed raw UTF-8, not writeUTF: writeUTF caps tokens at
      // 65535 encoded bytes and an unbroken >64 KB run (base64 blob,
      // minified payload) is a routine "token" in a raw corpus
      val tb = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(tb.length); out.write(tb); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < n) {
      val tb = new Array[Byte](in.readInt()); in.readFully(tb)
      val t = new String(tb, java.nio.charset.StandardCharsets.UTF_8)
      val c = in.readLong(); val e = in.readLong()
      buf.update(t, (c, e))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HeavyHitters {
  import org.apache.spark.sql.{Column, GraftColumnBridge}

  /** Column API: `heavyHitters(col, capacity, k)` → sorted
    * `array<struct<token,cnt,err>>` of the k most frequent values. */
  def heavyHitters(c: Column, capacity: Int, k: Int): Column =
    GraftColumnBridge.column(
      HeavyHittersAgg(GraftColumnBridge.expression(c), capacity, k)
        .toAggregateExpression())
}
