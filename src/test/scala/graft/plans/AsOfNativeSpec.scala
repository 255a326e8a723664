package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.AsOfJoin

/** The native as-of operator (logical node + strategy + sorted-merge
  * SparkPlan) against the composed union+window implementation: they
  * must be row-identical on every input — including the edge cases the
  * sf0.01 oracle can't stress (NULL keys/times on both sides, keys on
  * one side only, equal-timestamp ties, a key whose rows split across
  * many partitions) — and the native plan must actually BE the plan
  * the operator promises (merge after sort, no window, no union).
  */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  private def leftOf(rows: Seq[(java.lang.Long, java.lang.Long, String)]): DataFrame =
    rows.toDF("k", "t", "payload")
      .select(col("k"), col("t").cast("timestamp").as("t"), col("payload"))

  private def rightOf(rows: Seq[(java.lang.Long, java.lang.Long, Double)]): DataFrame =
    rows.toDF("k", "t", "v")
      .select(col("k"), col("t").cast("timestamp").as("t"), col("v"))

  private def both(l: DataFrame, r: DataFrame): (Seq[String], Seq[String]) = {
    def canon(df: DataFrame): Seq[String] =
      df.collect().map(_.mkString("|")).sorted.toSeq
    (canon(AsOfJoinNative.asof(l, r, "k", "t", Seq("v"))),
      canon(AsOfJoin.asof(l, r, "k", "t", Seq("v"))))
  }

  test("hand-built edges: ties, no-match keys, NULL keys and times on both sides") {
    val l = leftOf(Seq(
      (1L, 100L, "a"),   // matches r@100 (equal ts ties match)
      (1L, 99L, "b"),    // matches r@50
      (1L, 10L, "c"),    // before any right row → NULL
      (2L, 500L, "d"),   // key only on left → NULL
      (null, 100L, "e"), // NULL key → NULL
      (3L, null, "f")))  // NULL time → NULL
    val r = rightOf(Seq(
      (1L, 50L, 0.5), (1L, 100L, 1.0), (1L, 200L, 2.0),
      (4L, 10L, 4.0),      // key only on right → never emitted
      (null, 10L, -1.0),   // NULL key donates nothing
      (1L, null, -2.0)))   // NULL time donates nothing
    val (native, composed) = both(l, r)
    assert(native == composed, s"\nnative:   $native\ncomposed: $composed")
    // and the intended values, independently of the composed impl:
    val byPayload = AsOfJoinNative.asof(l, r, "k", "t", Seq("v"))
      .collect().map(row => row.getString(2) -> Option(row.get(3))).toMap
    assert(byPayload == Map("a" -> Some(1.0), "b" -> Some(0.5), "c" -> None,
      "d" -> None, "e" -> None, "f" -> None), byPayload.toString)
  }

  test("randomized equivalence with the composed operator (500 × 300 rows, 7 keys, heavy ties)") {
    val rnd = new scala.util.Random(42)
    def nl(p: Double, v: Long): java.lang.Long =
      if (rnd.nextDouble() < p) null else java.lang.Long.valueOf(v)
    val l = leftOf((1 to 500).map(i =>
      (nl(0.05, rnd.nextInt(7).toLong), nl(0.05, rnd.nextInt(50).toLong * 10), s"p$i")))
    // right unique per (k, t) — the operator's documented precondition
    val rRows = (1 to 300).map(_ =>
      (rnd.nextInt(9).toLong, rnd.nextInt(50).toLong * 10))
      .distinct.map { case (k, t) => (nl(0.05, k), nl(0.05, t), rnd.nextDouble()) }
    val rDeduped = rRows.groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
    val r = rightOf(rDeduped)
    val (native, composed) = both(l, r)
    assert(native == composed,
      s"diverged: ${native.diff(composed).take(5)} vs ${composed.diff(native).take(5)}")
  }

  test("a key split across many input partitions still merges correctly") {
    val l = leftOf((1 to 200).map(i => (1L: java.lang.Long, i.toLong * 10: java.lang.Long, s"p$i")))
      .repartition(13)
    val r = rightOf((1 to 50).map(i => (1L: java.lang.Long, i.toLong * 37: java.lang.Long, i.toDouble)))
      .repartition(7)
    val (native, composed) = both(l, r)
    assert(native == composed)
  }

  test("the physical plan is the promised one: sorted-merge exec, no window, no union") {
    val df = AsOfJoin.q102AsOfNative(spark, "/root/testdata/sf0.001")
    df.count() // settle AQE
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"native exec node missing:\n$p")
    assert(!p.contains("Union"), s"native plan must not union the sides:\n$p")
    // no running-last window implements the join itself: anything above
    // the exec node must be window-free (the right INPUT legitimately
    // uses a row_number window to dedupe clicks per (user, ts))
    val aboveJoin = p.substring(0, p.indexOf("AsOfJoin"))
    assert(!aboveJoin.contains("Window"),
      s"no window may run above the native join:\n$p")
    // and the join input feeds through exactly one sort per side
    assert("Sort \\[user_id".r.findAllIn(p).size >= 2,
      s"both sides must sort by (key, time) for the merge:\n$p")
  }

  test("right-side NULL-struct tearing can't happen: carried columns come from ONE right row") {
    // right rows where one carried column is NULL: a per-column fill
    // would mix r@100's non-null v with r@200's w — the struct/native
    // row semantics must keep (v, w) atomic per matched row.
    val l = Seq((1L, 300L, "x")).toDF("k", "t", "payload")
      .select(col("k"), col("t").cast("timestamp").as("t"), col("payload"))
    val r = Seq((1L, 100L, Some(10.0), None: Option[Double]),
        (1L, 200L, None: Option[Double], Some(20.0)))
      .toDF("k", "t", "v", "w")
      .select(col("k"), col("t").cast("timestamp").as("t"), col("v"), col("w"))
    val got = AsOfJoinNative.asof(l, r, "k", "t", Seq("v", "w")).collect().head
    assert(got.isNullAt(3) && got.getDouble(4) == 20.0,
      s"must carry (NULL, 20.0) atomically from the t=200 row: $got")
  }
}
