package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Bucketing

class ScaleToolsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin is row-identical to the plain join on skewed data") {
    // 90% of rows share one hot key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) s"k$i" else "HOT", i.toLong))
      .toDF("k", "v")
    val small = Seq(("HOT", "hot_dim"), ("k10", "d10"), ("k20", "d20"))
      .toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
    val salted = Skew.saltedJoin(big, small, Seq("k"), col("v"), saltFactor = 8)
      .select("k", "v", "name")
    assert(plain.count() == salted.count())
    assert(plain.join(salted, Seq("k", "v", "name"), "left_anti").count() == 0)
    assert(salted.join(plain, Seq("k", "v", "name"), "left_anti").count() == 0)
  }

  test("saltedAgg merges partials to the exact plain-agg result") {
    val df = (1 to 1000).map(i => ("HOT", i.toLong)).toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
    val salted = Skew.saltedAgg(df, Seq("k"), col("v"), 8)(
      partial = Seq((sum(col("v")), "s"), (count(lit(1)), "n")),
      merge = Seq((sum(col("s")), "s"), (sum(col("n")).cast("long"), "n")))
    assert(plain.collect().toSeq.map(_.toSeq) == salted.collect().toSeq.map(_.toSeq))
  }

  test("bucketed-by-key join plans with zero shuffle exchanges") {
    val n = 10000
    val facts = spark.range(n).select(col("id").as("k"), (col("id") * 2).as("v"))
    val dims = spark.range(n / 10).select(col("id").as("k"), col("id").cast("string").as("name"))
    Bucketing.writeBucketed(facts, "b_facts", Seq("k"), 4, Seq("k"))
    Bucketing.writeBucketed(dims, "b_dims", Seq("k"), 4, Seq("k"))

    val joined = Bucketing.table(spark, "b_facts")
      .join(Bucketing.table(spark, "b_dims"), "k")
    assert(joined.count() == n / 10)
    assert(Bucketing.exchangeCount(joined) == 0, "bucketed join must not shuffle")

    // contrast: the same join over unbucketed frames does shuffle
    // (or broadcasts; force SMJ off-broadcast to observe the exchange)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val unbucketed = facts.join(dims, "k")
      unbucketed.count()
      assert(Bucketing.exchangeCount(unbucketed) > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  // ------------------------------------------------ q134 rendezvous
  test("q134: removing a shard reassigns ONLY that shard's keys — everyone else stays put") {
    val ids = spark.range(1, 1001).select(col("id").as("doc_id"))
    val j = ids.select(col("doc_id"),
      LayoutQueries.hrwShard(col("doc_id"), 8).as("s8"),
      LayoutQueries.hrwShard(col("doc_id"), 7).as("s7"))
    // The HRW guarantee: a key's preference order over surviving shards
    // never changes, so only keys whose 8-shard argmax WAS shard 7 move.
    assert(j.where(col("s8") =!= 7 && col("s8") =!= col("s7")).count() == 0,
      "a surviving-shard key moved on reshard")
    val moved = j.where(col("s8") === 7).count()
    // ~1/8 of 1000 keys; a mod-8 → mod-7 rehash would move ~857.
    assert(moved > 60 && moved < 200, s"expected ~125 keys on the removed shard, got $moved")
  }

  test("q134: 60-bit hash scores spread keys near-uniformly across shards") {
    val counts = spark.range(1, 1001).select(
      LayoutQueries.hrwShard(col("id"), 8).as("shard"))
      .groupBy("shard").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0L to 7L).toSet, s"every shard must win some keys: $counts")
    counts.values.foreach(c =>
      assert(c > 60 && c < 200, s"shard counts should sit near 125: $counts"))
  }
}
