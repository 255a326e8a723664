package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Keyless interval (range) join — pair rows whose numeric points lie
  * within a radius of each other, with NO shared equi-key (SURVEY §2.4's
  * theta/range family, alongside the as-of join).
  *
  * Spark plans a bare `abs(l.pt - r.pt) <= R` predicate as a
  * BroadcastNestedLoopJoin — O(|L|·|R|) and a scale-killer. The fix is
  * the classic binning rewrite: bucket both sides by `floor(pt / R)`,
  * explode ONE side to its bucket and both neighbors, equi-join on the
  * bucket id, then apply the exact predicate. Any pair within R spans at
  * most adjacent buckets, so candidates are exact (no recall loss), each
  * true pair appears exactly once (each right row lands in a given
  * bucket at most once), and the join is a shuffle/broadcast HASH join
  * on a dense integer key.
  *
  * At 100 TB: cost is Σ per-bucket |L_b|·|R_b±1| — proportional to the
  * true temporal co-density, which is inherent to the query's semantics,
  * never to |L|·|R|. A hot bucket (event burst) is an AQE skew-join
  * case, same as any hot join key.
  */
object RangeJoin {

  /** ±5 minutes, in microseconds — both engines compare integer µs. */
  private[operators] val RadiusUs = 300000000L

  /** Candidate pairs with `|left(lp) - right(rp)| <= radius` via the
    * binned equi-join. `lp`/`rp` must be distinct long-typed column
    * names; all columns of both sides survive. */
  def intervalJoin(left: DataFrame, lp: String, right: DataFrame, rp: String,
      radius: Long): DataFrame = {
    require(lp != rp, s"point columns must differ, got '$lp' twice")
    val overlap = left.columns.toSet intersect right.columns.toSet
    require(overlap.isEmpty,
      s"left and right must not share column names (all columns survive the join); " +
        s"rename ${overlap.mkString(", ")} on one side first")
    val reserved = (left.columns ++ right.columns).toSet intersect Set("__bin", "__b")
    require(reserved.isEmpty, s"column names ${reserved.mkString(", ")} are reserved")
    // Exact floor division in integer arithmetic: `floor(col / radius)`
    // is DOUBLE division, which loses precision past 2^53 — nanosecond
    // epochs are in-domain for a generic long-point interval join, and a
    // rounded bin silently drops in-radius pairs at the bin edge.
    def floorDiv(c: Column, d: Long): Column =
      call_function("div", c - pmod(c, lit(d)), lit(d))
    val l = left.withColumn("__bin", floorDiv(col(lp), radius))
    val r = right
      .withColumn("__b", floorDiv(col(rp), radius))
      .withColumn("__bin", explode(array(col("__b") - 1, col("__b"), col("__b") + 1)))
      .drop("__b")
    l.join(r, "__bin")
      .where(abs(col(lp) - col(rp)) <= radius)
      .drop("__bin")
  }

  /** Q41: temporal co-occurrence with no join key — for every purchase,
    * how many signups (any user) happened within ±5 minutes. The
    * reference's dashboard correlates event streams by wall-clock
    * windows the same way (`streamlit-app.py:155-169` family); this is
    * the ad-hoc-radius version a training pipeline uses for burst /
    * campaign attribution. */
  def q41RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    // ts is timestamp_ntz; cast to instant under the UTC session tz so
    // unix_micros(ts) ≡ DuckDB epoch_us(ts) (parity playbook).
    // Persisted: purchases feeds the interval join AND the final
    // left join — without materialization the events scan + filter
    // would run twice.
    val purchases = graft.core.Caches.persistTracked(
      ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("ts"), unix_micros(col("ts").cast("timestamp")).as("pus")))
    val signups = ev.where(col("event_type") === "signup")
      .select(unix_micros(col("ts").cast("timestamp")).as("sus"))
    val counts = intervalJoin(purchases, "pus", signups, "sus", RadiusUs)
      .groupBy("event_id").agg(count(lit(1)).as("n_signups"))
    purchases.join(counts, Seq("event_id"), "left")
      .select(col("event_id"), col("ts"),
        coalesce(col("n_signups"), lit(0L)).as("n_signups"))
  }

  val q41Sql: String =
    s"""WITH p AS (SELECT event_id, ts, epoch_us(ts) AS pus FROM events WHERE event_type = 'purchase'),
       |s AS (SELECT epoch_us(ts) AS sus FROM events WHERE event_type = 'signup'),
       |c AS (SELECT p.event_id, count(*) AS n FROM p JOIN s ON abs(p.pus - s.sus) <= $RadiusUs GROUP BY 1)
       |SELECT p.event_id, p.ts, coalesce(c.n, 0) AS n_signups
       |FROM p LEFT JOIN c USING (event_id)""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_range_join" -> q41RangeJoin _)

  val oracles: Map[String, String] = Map(
    "q41_range_join" -> q41Sql)
}
