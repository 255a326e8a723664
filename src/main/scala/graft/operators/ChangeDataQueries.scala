package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Change-data-capture shapes — the operators that turn an append-only
  * change stream into queryable current/historical state. The reference
  * pipeline's silver layer is append-only with repair-by-rewrite; these
  * queries add the two standard consumption patterns downstream
  * warehouses build on top of exactly such a layer: versioned dimension
  * history (SCD Type 2) and snapshot maintenance by merge (CDC upsert
  * compaction).
  *
  * Scale shapes: both operators window/aggregate per entity key
  * (`user_id` / `o_custkey` — uniform, high-cardinality), so partition
  * counts grow with the data and no single task ever sees more than one
  * key group's rows. Timestamps compare as microsecond longs
  * (engine-portable; see the oracle parity playbook).
  */
object ChangeDataQueries {

  private def us(c: org.apache.spark.sql.Column) =
    unix_micros(c.cast("timestamp"))

  // -------------------------------------------------------- q68 SCD2
  /** Q68: slowly-changing-dimension (type 2) history build. The event
    * stream is read as per-user attribute changes (`event_type` is the
    * tracked attribute); consecutive duplicates collapse (a change row
    * opens a version only when the value actually changed), each version
    * carries `[valid_from, valid_to)` microsecond bounds, and the open
    * version is flagged current. Ties on timestamp break by `event_id`
    * so version order is total on every engine. */
  def q68Scd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
    val changes = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type").as("state"),
        us(col("ts")).as("t"), col("event_id"))
      .withColumn("prev", lag("state", 1).over(w))
      .where(col("prev").isNull || col("prev") =!= col("state"))
    // version windows re-rank only the surviving change rows
    val wv = Window.partitionBy("user_id").orderBy(col("t"), col("event_id"))
    changes
      .withColumn("valid_to", lead("t", 1).over(wv))
      .select(col("user_id"), col("state"), col("t").as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
  }

  val q68Sql: String =
    """WITH c AS (SELECT user_id, event_type AS state, epoch_us(ts) AS t, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events),
      |v AS (SELECT user_id, state, t, event_id FROM c
      |  WHERE prev IS NULL OR prev <> state)
      |SELECT user_id, state, t AS valid_from,
      |  lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS valid_to,
      |  lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL AS is_current
      |FROM v""".stripMargin

  // ------------------------------------------------------- q71 merge
  /** Q71: CDC merge/upsert — apply a change set to a snapshot with
    * MERGE semantics, no table format required: the change set first
    * compacts to one winner per key (latest order by date, orderkey
    * tie-break — CDC log compaction), then a single full-outer join
    * classifies every key as update / delete / insert / untouched and
    * emits the post-merge snapshot. Here the `orders` stream acts as
    * the change feed over the `customer` snapshot: a customer's latest
    * order restates their balance, and a latest order in status `F`
    * retires the row. Deletes are dropped from the snapshot but kept
    * visible via `op` for audit. */
  def q71Merge(spark: SparkSession, dir: String): DataFrame = {
    val wk = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val changes = Tables(spark, dir, "orders")
      .withColumn("rn", row_number().over(wk))
      .where(col("rn") === 1)
      .select(col("o_custkey").as("key"),
        col("o_totalprice").as("new_bal"), col("o_orderstatus").as("status"))
    val snap = Tables(spark, dir, "customer")
    snap.join(changes, snap("c_custkey") === changes("key"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("key")).as("cust_key"),
        coalesce(col("c_name"), lit("NEW")).as("name"),
        round(coalesce(col("new_bal"), col("c_acctbal")), 6).as("balance"),
        when(col("key").isNull, "untouched")
          .when(col("status") === "F", "delete")
          .when(col("c_custkey").isNull, "insert")
          .otherwise("update").as("op"))
      .where(col("op") =!= "delete")
  }

  val q71Sql: String =
    """WITH ranked AS (SELECT o_custkey AS key, o_totalprice AS new_bal,
      |    o_orderstatus AS status, row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders),
      |changes AS (SELECT key, new_bal, status FROM ranked WHERE rn = 1),
      |m AS (SELECT coalesce(c_custkey, key) AS cust_key,
      |    coalesce(c_name, 'NEW') AS name,
      |    round(coalesce(new_bal, c_acctbal), 6) AS balance,
      |    CASE WHEN key IS NULL THEN 'untouched'
      |         WHEN status = 'F' THEN 'delete'
      |         WHEN c_custkey IS NULL THEN 'insert'
      |         ELSE 'update' END AS op
      |  FROM customer FULL OUTER JOIN changes ON c_custkey = key)
      |SELECT cust_key, name, balance, op FROM m WHERE op <> 'delete'""".stripMargin

  // ----------------------------------------------- q81 snapshot diff
  /** Q81: snapshot diff — the inverse of q71's merge: given two
    * versions of a table, emit the change set (insert / update /
    * delete + before/after values) that transforms one into the other.
    * This is how a lakehouse without a table format derives a CDC feed
    * (e.g. to re-sync a downstream index or feature store) from plain
    * partitioned parquet: one full-outer join on the key, keep only
    * rows that changed. The two "versions" are carved deterministically
    * from `customer` (every 10th key missing from A, every 9th from B,
    * every 7th re-balanced in B) so the oracle sees identical inputs.
    *
    * Scale shape: a single partition-wise shuffle join on the uniform
    * primary key — the one join both snapshots would be bucketed on in
    * a real lake ([[graft.sources.Bucketing]] gives the zero-exchange
    * variant); output is changed rows only, which is what bounds the
    * downstream feed regardless of snapshot size. */
  def q81SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    snapshotDiffOn(
      c.where(pmod(col("c_custkey"), lit(10)) =!= 0)
        .select(col("c_custkey"), col("c_acctbal").as("old_bal")),
      c.where(pmod(col("c_custkey"), lit(9)) =!= 0)
        .select(col("c_custkey"),
          when(pmod(col("c_custkey"), lit(7)) === 0, col("c_acctbal") + 10)
            .otherwise(col("c_acctbal")).as("new_bal")))
  }

  /** The diff core: `a` is (c_custkey, old_bal), `b` is (c_custkey,
    * new_bal); emits changed keys only, classified. NULL-valued
    * balances classify by key presence, not value (a key present in
    * both snapshots with one NULL side is an update only under
    * null-safe inequality). */
  private[operators] def snapshotDiffOn(a: DataFrame, b: DataFrame): DataFrame = {
    val inA = a.select(col("c_custkey"), lit(true).as("in_a"), col("old_bal"))
    val inB = b.select(col("c_custkey"), lit(true).as("in_b"), col("new_bal"))
    inA.join(inB, Seq("c_custkey"), "full_outer")
      .withColumn("change_type",
        when(col("in_a").isNull, "insert")
          .when(col("in_b").isNull, "delete")
          .when(!(col("old_bal") <=> col("new_bal")), "update"))
      .where(col("change_type").isNotNull)
      .select(col("c_custkey"), col("change_type"),
        round(col("old_bal"), 6).as("old_bal"),
        round(col("new_bal"), 6).as("new_bal"))
  }

  val q81Sql: String =
    """WITH a AS (SELECT c_custkey, c_acctbal AS old_bal
      |    FROM customer WHERE c_custkey % 10 <> 0),
      |b AS (SELECT c_custkey,
      |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 10 ELSE c_acctbal END AS new_bal
      |    FROM customer WHERE c_custkey % 9 <> 0),
      |j AS (SELECT coalesce(a.c_custkey, b.c_custkey) AS c_custkey, old_bal, new_bal,
      |    CASE WHEN a.c_custkey IS NULL THEN 'insert'
      |         WHEN b.c_custkey IS NULL THEN 'delete'
      |         WHEN old_bal IS DISTINCT FROM new_bal THEN 'update' END AS change_type
      |  FROM a FULL OUTER JOIN b ON a.c_custkey = b.c_custkey)
      |SELECT c_custkey, change_type, round(old_bal, 6) AS old_bal,
      |  round(new_bal, 6) AS new_bal
      |FROM j WHERE change_type IS NOT NULL""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_scd2" -> q68Scd2 _,
    "q71_merge" -> q71Merge _,
    "q81_snapshot_diff" -> q81SnapshotDiff _)

  val oracles: Map[String, String] = Map(
    "q68_scd2" -> q68Sql,
    "q71_merge" -> q71Sql,
    "q81_snapshot_diff" -> q81Sql)
}
