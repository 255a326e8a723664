package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden-output check for the flagship per-minute window aggregation
  * (SURVEY §5.5): the canonicalized q03 result at sf0.001 is pinned in
  * test resources, so a semantic drift in the window/aggregation stack
  * fails here even if both engines drift together (the DuckDB oracle
  * can't catch that case). */
class GoldenSpec extends SparkSpec {

  test("q03 matches the checked-in golden output at sf0.001") {
    val got = CoreQueries.q03WindowAgg(spark, "/root/testdata/sf0.001")
      .orderBy(col("minute"), col("user_id")) // numeric sort BEFORE casting
      .select(
        date_format(col("minute"), "yyyy-MM-dd HH:mm:ss").as("minute"),
        col("user_id").cast("string"),
        round(col("avg_value"), 6).cast("string").as("avg_value"),
        col("min_event_type"),
        col("n").cast("string"))
      .collect()
      .map(_.toSeq.map(String.valueOf).mkString(","))

    val golden = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden_q03_sf0.001.csv"))
      .getLines().drop(1).toArray

    assert(got.length == golden.length, s"${got.length} rows vs golden ${golden.length}")
    got.zip(golden).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"row $i: got [$g] want [$w]")
    }
  }
}
