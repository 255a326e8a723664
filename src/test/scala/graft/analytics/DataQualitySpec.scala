package graft.analytics

import graft.SparkSpec
import graft.analytics.DataQuality._

/** Detection proof for the quality suite: the oracle-checked q38 runs on
  * clean synthetic data (all checks pass), so this spec feeds dirty data
  * and asserts each check actually fires. */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private def dirty = Seq(
    (Some(1L), Some("click"), 10.0),
    (Some(1L), Some("click"), -5.0), // dup id + below range
    (None, Some("bogus"), 2000.0), // null id + bad value + above range
    (Some(3L), None, 50.0)) // null type
    .toDF("event_id", "event_type", "value")

  test("each check fires on violating rows") {
    val res = DataQuality.run(dirty, Seq(
      NotNull(Seq("event_id")),
      Unique(Seq("event_id")),
      AcceptedValues("event_type", Seq("click", "view")),
      InRange("value", 0.0, 1000.0)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(res("not_null(event_id)") == ((1L, false)))
    assert(res("unique(event_id)") == ((1L, false))) // 4 rows, 3 distinct (null counts once)
    assert(res("accepted_values(event_type:click|view)") == ((2L, false))) // 'bogus' + null
    assert(res("in_range(value,0.0,1000.0)") == ((2L, false)))
  }

  test("parameterized names keep two checks on one column distinct") {
    val res = DataQuality.run(dirty, Seq(
      InRange("value", 0.0, 1000.0), InRange("value", 0.0, 40.0)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(res("in_range(value,0.0,1000.0)") == 2L) // -5.0, 2000.0
    assert(res("in_range(value,0.0,40.0)") == 3L) // -5.0, 2000.0, 50.0
  }

  test("orphans counts children without parents") {
    val child = Seq(1L, 2L, 9L).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("p")
    assert(orphans(child, "k", parent, "p") == 1L)
  }

  test("orphans works when child and parent key columns share a name") {
    val child = Seq(1L, 2L, 9L).toDF("user_id")
    val parent = Seq(1L, 2L, 3L).toDF("user_id")
    assert(orphans(child, "user_id", parent, "user_id") == 1L)
  }
}
