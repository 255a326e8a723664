package graft.operators

import graft.SparkSpec

/** q81's classification matrix on cases the customer-table oracle can't
  * produce: NULL balances. Presence is tracked by join side, not value
  * nullness, and the update test is null-safe — a key whose balance
  * goes NULL→5 (or 5→NULL) is an update, NULL→NULL is unchanged.
  */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("q81 core: insert/delete/update/unchanged classify correctly with NULLs") {
    val a = Seq[(Long, Option[java.math.BigDecimal])](
      (1L, Some(new java.math.BigDecimal("10.00"))), // unchanged
      (2L, Some(new java.math.BigDecimal("20.00"))), // update (value)
      (3L, Some(new java.math.BigDecimal("30.00"))), // delete
      (4L, None),                                    // update (NULL -> 5)
      (5L, None)                                     // unchanged (NULL -> NULL)
    ).toDF("c_custkey", "old_bal")
    val b = Seq[(Long, Option[java.math.BigDecimal])](
      (1L, Some(new java.math.BigDecimal("10.00"))),
      (2L, Some(new java.math.BigDecimal("25.00"))),
      (4L, Some(new java.math.BigDecimal("5.00"))),
      (5L, None),
      (6L, Some(new java.math.BigDecimal("60.00"))) // insert
    ).toDF("c_custkey", "new_bal")
    val got = ChangeDataQueries.snapshotDiffOn(a, b).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "update", 3L -> "delete", 4L -> "update", 6L -> "insert"),
      s"got $got")
  }
}
