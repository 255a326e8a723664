package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the hot-key joins a 100 TB telemetry
  * lake produces (one chatty device, one dominant district).
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin`) is the first
  * line of defense and is on by default in [[graft.core.GraftSession]];
  * salting is the explicit fallback for deterministic plans, pre-AQE
  * engines, or aggregation pipelines AQE doesn't rebalance.
  */
object Skew {

  /** Salted equi-join of a skewed big side against a small-but-not-
    * broadcastable side: the big side gets a deterministic salt from a
    * per-row distinguisher, the small side is replicated once per salt
    * value, and the join key becomes (key, salt) — splitting each hot
    * key across `saltFactor` reducers. Result is row-identical to the
    * plain join. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      distinguisher: Column,
      saltFactor: Int = 16): DataFrame = {
    val bigS = big.withColumn("__salt", pmod(xxhash64(distinguisher), lit(saltFactor)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    bigS.join(smallS, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase salted aggregation for high-cardinality-value aggregates
    * (e.g. collect-like or distinct-heavy) where map-side combine can't
    * shrink a hot group: phase 1 aggregates (keys, salt) partials,
    * phase 2 merges partials per key. The caller supplies both agg
    * levels; for algebraic aggregates (sum/count/min/max) prefer plain
    * groupBy — Spark's partial aggregation already handles those. */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      distinguisher: Column,
      saltFactor: Int)(
      partial: Seq[(Column, String)],
      merge: Seq[(Column, String)]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(distinguisher), lit(saltFactor)).cast("int"))
    val p = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head._1.as(partial.head._2),
        partial.tail.map { case (c, n) => c.as(n) }: _*)
    p.groupBy(keys.map(col): _*)
      .agg(merge.head._1.as(merge.head._2),
        merge.tail.map { case (c, n) => c.as(n) }: _*)
  }
}
