package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("typed top-k agg matches window-sort top-k on random data") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(5000)((rnd.nextInt(8).toLong, rnd.nextDouble() * 100, rnd.nextLong().abs))
    val df = rows.toDF("g", "score", "id")

    // aggregator path: bounded buffers through the shuffle
    val topk = new TopKAggregator(5).toColumn
    val got = df.select(col("g"), struct(col("score"), col("id")).as("p"))
      .as[(Long, (Double, Long))]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(topk.name("topk"))
      .collect()
      .map { case (g, xs) => g -> xs.map(_._2) }.toMap

    // reference path: full window sort
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("score").desc, col("id"))
    val want = df.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
      .orderBy(col("g"), col("rn"))
      .select("g", "id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSeq }

    assert(got.keySet == want.keySet)
    want.foreach { case (g, ids) => assert(got(g) == ids, s"group $g") }
  }

  test("reduce keeps the buffer bounded at k") {
    val agg = new TopKAggregator(3)
    val buf = (1 to 100).foldLeft(agg.zero)((b, i) => agg.reduce(b, (i.toDouble, i.toLong)))
    assert(buf.size == 3)
    assert(buf.map(_._1) == Seq(100.0, 99.0, 98.0))
  }
}
