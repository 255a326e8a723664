package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.HeavyHitters.heavyHitters

/** SpaceSaving aggregate semantics the q65 oracle can't pin: exactness
  * in the no-eviction regime across arbitrary partitionings, the
  * ≥-true-count presence guarantee under eviction pressure, and
  * partial/final merge through a real shuffle.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def top(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long)] =
    df.select(explode(col("hh")).as("x"))
      .select("x.token", "x.cnt", "x.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("exact regime: capacity over vocabulary reproduces exact counts on any partitioning") {
    val words = Seq.fill(50)("alpha") ++ Seq.fill(30)("beta") ++
      Seq.fill(20)("gamma") ++ Seq.fill(5)("delta")
    for (parts <- Seq(1, 7)) {
      val df = words.toDF("w").repartition(parts)
        .agg(heavyHitters(col("w"), capacity = 16, k = 3).as("hh"))
      assert(top(df) == Seq(("alpha", 50L, 0L), ("beta", 30L, 0L), ("gamma", 20L, 0L)),
        s"at $parts partitions")
    }
  }

  test("eviction pressure: the dominant item survives with cnt >= true count") {
    // 1000 'hot' + 200 distinct one-off items through capacity 8: the
    // SpaceSaving guarantee (freq > n/capacity present, estimate >= true)
    val words = Seq.fill(1000)("hot") ++ (0 until 200).map(i => s"rare$i")
    val df = words.toDF("w").repartition(1) // single stream: classic bounds apply
      .agg(heavyHitters(col("w"), capacity = 8, k = 8).as("hh"))
    val rows = top(df)
    val hot = rows.find(_._1 == "hot").get
    assert(hot._2 >= 1000L, s"estimate must never undercount: $hot")
    assert(hot._2 - hot._3 <= 1000L, "cnt - err is a lower bound on the true count")
  }

  test("mergeable-summaries bound: an item evicted from one buffer is never undercounted") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String

    val agg = HeavyHittersAgg(BoundReference(0, StringType, nullable = true),
      capacity = 2, k = 2)
    def stream(words: Seq[String]) = {
      val buf = agg.createAggregationBuffer()
      words.foreach(w => agg.update(buf, InternalRow(UTF8String.fromString(w))))
      buf
    }
    // Stream A holds 'a' comfortably; stream B sees 'a' first, then
    // evicts it under pressure from 'c'/'d'. A merge that charges absent
    // items zero (the pre-PODS'12 shortcut) reports a=5 < true 7.
    val bufA = stream(Seq.fill(5)("a") ++ Seq.fill(3)("b"))
    val bufB = stream(Seq.fill(2)("a") ++ Seq.fill(3)("c") ++ Seq.fill(4)("d"))
    val truth = Map("a" -> 7L, "b" -> 3L, "c" -> 3L, "d" -> 4L)

    val merged = agg.merge(bufA, bufB)
    assert(merged.size <= 2, "merge must truncate back to capacity")
    merged.foreach { case (t, (cnt, err)) =>
      assert(cnt >= truth(t), s"$t: estimate $cnt must be >= true ${truth(t)}")
      assert(cnt - err <= truth(t), s"$t: cnt-err ${cnt - err} must be <= true ${truth(t)}")
    }
    assert(merged.contains("a"), "the globally-dominant item must survive the merge")
  }

  test("tokens beyond writeUTF's 64 KB cap survive the partial-aggregate shuffle") {
    // serialize() is length-prefixed raw UTF-8, not writeUTF — a single
    // unbroken >64 KB 'token' (base64 blob, minified payload) must not
    // kill the aggregation at shuffle time
    val blob = "x" * 70000
    val df = (Seq.fill(3)(blob) ++ Seq.fill(2)("small")).toDF("w")
      .repartition(4) // forces partial buffers through serialize/merge
      .agg(heavyHitters(col("w"), 8, 2).as("hh"))
    assert(top(df) == Seq((blob, 3L, 0L), ("small", 2L, 0L)))
  }

  test("non-string input is implicitly cast at analysis, not a runtime ClassCastException") {
    val df = Seq(101L, 101L, 202L).toDF("n")
      .agg(heavyHitters(col("n"), 4, 1).as("hh"))
    assert(top(df) == Seq(("101", 2L, 0L)))
  }

  test("null inputs are ignored; groups keep independent sketches") {
    val df = Seq(("en", "a"), ("en", "a"), ("en", null), ("fr", "b"))
      .toDF("g", "w")
      .groupBy("g").agg(heavyHitters(col("w"), 4, 2).as("hh"))
    val byG = df.collect().map(r => r.getString(0) ->
      r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getString(0), x.getLong(1)))).toMap
    assert(byG("en") == Seq(("a", 2L)))
    assert(byG("fr") == Seq(("b", 1L)))
  }
}
