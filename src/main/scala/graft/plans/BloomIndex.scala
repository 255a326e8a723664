package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom membership index over a column — the fixed-size "have we seen
  * this content before?" primitive a 100 TB ingest pipeline keeps
  * between runs.
  *
  * The build is one distributed aggregation (Spark's native
  * `BloomFilterAggregate`, the same machinery its runtime join filters
  * use): each partition fills a local sketch, partials OR together
  * (mergeable — union is bitwise), and only the final few-MB bitmap
  * reaches the driver. The probe is a map-side predicate on the new
  * batch — no shuffle, no join, no corpus re-scan. False positives are
  * possible, false negatives are not, so:
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
  * index is maintained by [[union]]-ing the new day's sketch in, never
  * rebuilt. (Spark's automatic runtime bloom filters do this WITHIN one
  * join's execution; this primitive makes the sketch a first-class,
  * persistable artifact reusable across queries and days.)
  */
object BloomIndex {

  /** Aggregate a long-typed column (hash your content first — e.g.
    * `xxhash64(text)`) into a serialized bloom filter sized for
    * `expectedItems` at the default ~3% fpp. */
  def bloomAgg(c: Column, expectedItems: Long): Column =
    GraftColumnBridge.column(
      new BloomFilterAggregate(GraftColumnBridge.expression(c), expectedItems)
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
