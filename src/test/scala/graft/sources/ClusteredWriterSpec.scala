package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The z-order write path against the single-sort strawman it exists
  * to beat: after clustering on BOTH dimensions, every file's bounding
  * box is tight in BOTH — while a one-column sort leaves the other
  * dimension's boxes spanning the whole domain (no pruning for that
  * predicate).
  */
class ClusteredWriterSpec extends SparkSpec {
  import spark.implicits._

  test("z-ordered files bound BOTH dimensions; a single-column sort only one") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(20000)((rnd.nextInt(100000).toLong, rnd.nextInt(100000).toLong))
    val df = rows.toDF("user_id", "event_id")

    val zPath = tmpDir("zorder")
    ClusteredWriter.writeZOrdered(df, col("user_id"), col("event_id"), zPath, 16)
    val zAudit = ClusteredWriter.auditLayout(
      spark.read.parquet(zPath), col("user_id"), col("event_id"))
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(zAudit.length == 16, s"expected 16 files, got ${zAudit.length}")

    val sPath = tmpDir("singlesort")
    df.withColumn("qx", pmod(col("user_id"), lit(256L)))
      .repartitionByRange(16, col("qx")).sortWithinPartitions("qx").drop("qx")
      .write.parquet(sPath)
    val sAudit = ClusteredWriter.auditLayout(
      spark.read.parquet(sPath), col("user_id"), col("event_id"))
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))

    def mean(xs: Seq[Double]) = xs.sum / xs.size
    val (zx, zy) = (mean(zAudit.map(_._2).toSeq), mean(zAudit.map(_._3).toSeq))
    val (sx, sy) = (mean(sAudit.map(_._2).toSeq), mean(sAudit.map(_._3).toSeq))
    // z-order: both dims bounded well under the full domain
    assert(zx < 0.5 && zy < 0.5, s"z layout spans x=$zx y=$zy")
    // single sort: its own key tight, the OTHER dimension unbounded
    assert(sx < 0.2, s"sorted dim must be tight: $sx")
    assert(sy > 0.9, s"the unsorted dim must span the domain: $sy")
    // and the z layout's worst dim beats the single sort's worst dim
    assert(math.max(zx, zy) < sy, "two bounded dims is the whole point")
  }
}
