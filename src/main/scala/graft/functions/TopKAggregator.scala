package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k accumulator (`Aggregator[IN, BUF, OUT]`): keeps the k
  * best (score, id) pairs per group in a bounded buffer, merged
  * associatively across partitions.
  *
  * Scale rationale: `row_number().over(Window.partitionBy(g).orderBy(s))`
  * sorts EVERY row of every group to discard all but k; this aggregator
  * carries at most k elements per partition per group through the
  * shuffle — the right shape when groups are large and k is small
  * (top-k neighbors, top-k documents per query). Ties break on id so
  * results are deterministic.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  // score DESC with NaN ranked GREATEST — java.lang.Double.compare, the
  // ordering SQL engines use for ORDER BY (Spark and DuckDB both sort
  // NaN above +Inf). A plain `>` comparison silently drops NaN scores
  // (NaN > x is always false) and diverges from the row_number oracle
  // whenever a degenerate (zero-norm) vector makes cosine NaN.
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  private def prune(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.sorted(ord).take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size < k || ord.compare(in, buf.last) < 0) prune(buf :+ in)
    else buf

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    prune(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
