package graft

import org.apache.spark.sql.functions._

import graft.functions.TimeExprs
import graft.operators.AsOfJoin

/** Property-style checks (SURVEY §5.3) over seeded random inputs:
  * epoch-normalization invariants, partition round-trip identity,
  * drift-union tolerance, and as-of join vs a naive reference. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("property: the four epoch precisions of one instant normalize identically") {
    val seconds = Seq.fill(200)(946684800L + rnd.nextInt(1500000000)) // 2000..2047
    val df = seconds.toDF("s").select(
      TimeExprs.normalizeEpoch(col("s")).as("a"),
      TimeExprs.normalizeEpoch(col("s") * 1000L).as("b"),
      TimeExprs.normalizeEpoch(col("s") * 1000000L).as("c"),
      TimeExprs.normalizeEpoch(col("s") * 1000000000L).as("d"))
    assert(df.where(col("a") =!= col("b") || col("a") =!= col("c") || col("a") =!= col("d"))
      .count() == 0)
  }

  test("property: partitioned write → read is identity on content") {
    val rows = Seq.fill(300)((rnd.nextLong().abs % 1000000, rnd.nextInt(5),
      rnd.nextDouble() * 100, rnd.nextInt(3).toString))
    val df = rows.toDF("id", "part", "v", "tag")
    val path = tmpDir("roundtrip")
    df.write.partitionBy("part", "tag").parquet(path)
    val back = spark.read.parquet(path)
    assert(back.count() == 300)
    // content identity: anti-joins empty in both directions
    val key = Seq("id", "part", "v", "tag")
    assert(df.join(back, key, "left_anti").count() == 0)
    assert(back.join(df, key, "left_anti").count() == 0)
  }

  test("property: unionByName tolerates arbitrary column subsets") {
    val cols = Seq("a", "b", "c", "d")
    val full = spark.range(50).select(col("id") +: cols.map(c => col("id").cast("double").as(c)): _*)
    (1 to 10).foreach { _ =>
      val keep = cols.filter(_ => rnd.nextBoolean())
      val sub = full.select((Seq("id") ++ keep).map(col): _*)
      val u = sub.unionByName(full, allowMissingColumns = true)
      assert(u.columns.toSet == full.columns.toSet)
      assert(u.count() == 100)
      val dropped = cols.diff(keep)
      dropped.headOption.foreach { d =>
        assert(u.where(col(d).isNull).count() == 50)
      }
    }
  }

  test("property: as-of join matches a naive per-row lookup") {
    val left = Seq.fill(120)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(100000)))
      .zipWithIndex.map { case ((k, t, v), i) => (i.toLong, k, t, v) }
    val right = Seq.fill(80)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(100000)))
      .groupBy(r => (r._1, r._2)).map(_._2.head) // unique per (key, time)
      .zipWithIndex.map { case ((k, t, v), i) => (i.toLong, k, t, v) }.toSeq

    val l = left.toDF("lid", "k", "t", "lv")
    val r = right.toDF("rid", "k", "t", "rv")
    val got = AsOfJoin.asof(l, r, "k", "t", Seq("rid"))
      .select("lid", "r_rid").as[(Long, Option[Long])].collect().toMap

    left.foreach { case (lid, k, t, _) =>
      val expect = right.filter(x => x._2 == k && x._3 <= t)
        .sortBy(x => (x._3, x._1)).lastOption.map(_._1)
      assert(got(lid) == expect, s"left $lid key $k t $t")
    }
  }
}
