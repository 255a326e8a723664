package graft.operators

import graft.SparkSpec

/** Regression tests for the as-of join's null semantics (review
  * findings): the matched right row must arrive atomically even when it
  * contains NULL members, and NULL join keys must never match. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("a matched right row with NULL members is not torn across rows") {
    // right rows per key k=1: (t=5, id=3, v=2.0), (t=10, id=7, v=NULL)
    val left = Seq((100L, 1L, 12L)).toDF("lid", "k", "t")
    val right = Seq(
      (1L, 5L, 3L, Option(2.0)),
      (1L, 10L, 7L, Option.empty[Double]))
      .toDF("k", "t", "rid", "rv")
    val got = AsOfJoin.asof(left, right, "k", "t", Seq("rid", "rv"))
      .select("lid", "r_rid", "r_rv").collect().head
    assert(got.getLong(1) == 7L) // latest row's id...
    assert(got.isNullAt(2), "rv must be the matched row's NULL, not an older row's value")
  }

  test("NULL keys never match on either side") {
    val left = Seq(
      (100L, Option(1L), 10L), // normal key
      (101L, Option.empty[Long], 10L)) // null key: must get no match
      .toDF("lid", "k", "t")
    val right = Seq(
      (Option(1L), 5L, 3L),
      (Option.empty[Long], 1L, 99L)) // null-key right row: donates nothing
      .toDF("k", "t", "rid")
    val got = AsOfJoin.asof(left, right, "k", "t", Seq("rid"))
      .select("lid", "r_rid").as[(Long, Option[Long])].collect().toMap
    assert(got(100L) == Some(3L))
    assert(got(101L) == None, "null-key left row must not inherit from null-key right rows")
  }

  test("left rows before any right row keep nulls (left-join semantics)") {
    val left = Seq((100L, 1L, 3L)).toDF("lid", "k", "t")
    val right = Seq((1L, 5L, 7L)).toDF("k", "t", "rid")
    val got = AsOfJoin.asof(left, right, "k", "t", Seq("rid"))
      .select("r_rid").collect().head
    assert(got.isNullAt(0))
  }
}
