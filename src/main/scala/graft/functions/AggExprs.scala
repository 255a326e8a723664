package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-insensitive floating-point aggregation.
  *
  * `sum(double)` varies in the last ULPs with the shuffle's merge order;
  * summing over DECIMAL is exact and associative, so results are
  * identical on a 4-thread laptop and a 1000-executor cluster — both a
  * reproducibility property (reruns/failover give bit-identical
  * dashboards) and the mechanism behind DuckDB-oracle hash parity.
  */
object AggExprs {

  /** Exact double sum: cast to decimal, sum, cast back. */
  def decSum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Deterministic mean built from the exact sum (null-skipping count,
    * matching `avg` semantics). */
  def decAvg(c: Column): Column = decSum(c) / count(c)
}
