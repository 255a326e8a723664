package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The z-order write path against the single-sort strawman it exists
  * to beat: after clustering on BOTH dimensions, every file's bounding
  * box is tight in BOTH — while a one-column sort leaves the other
  * dimension's boxes spanning the whole domain (no pruning for that
  * predicate). Spans are audited in RAW column space — the domain here
  * (0..100000) is ~400× wider than the 256 quantization buckets, so a
  * mod-based quantizer (which wraps the raw domain around every file)
  * fails this spec: only range quantization delivers raw-footer
  * prunability.
  */
class ClusteredWriterSpec extends SparkSpec {
  import spark.implicits._

  test("z-ordered files bound BOTH raw dimensions; a single-column sort only one") {
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
    df.repartitionByRange(16, col("user_id")).sortWithinPartitions("user_id")
      .write.parquet(sPath)
    val sAudit = ClusteredWriter.auditLayout(
      spark.read.parquet(sPath), col("user_id"), col("event_id"))
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))

    def mean(xs: Seq[Double]) = xs.sum / xs.size
    val (zx, zy) = (mean(zAudit.map(_._2).toSeq), mean(zAudit.map(_._3).toSeq))
    val (sx, sy) = (mean(sAudit.map(_._2).toSeq), mean(sAudit.map(_._3).toSeq))
    // z-order: both RAW dims bounded well under the full domain
    assert(zx < 0.5 && zy < 0.5, s"z layout spans x=$zx y=$zy")
    // single sort: its own key tight, the OTHER dimension unbounded
    assert(sx < 0.2, s"sorted dim must be tight: $sx")
    assert(sy > 0.9, s"the unsorted dim must span the domain: $sy")
    // and the z layout's worst dim beats the single sort's worst dim
    assert(math.max(zx, zy) < sy, "two bounded dims is the whole point")
  }

  test("compaction with clusterBy publishes a z-ordered partition (q98's metric shrinks)") {
    import graft.jobs.CompactionJob
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(20000)((rnd.nextInt(100000).toLong, rnd.nextInt(100000).toLong))
    def fragmentedRoot(): String = {
      val root = tmpDir("compact_root")
      // 8 small files in one hive leaf — fragmented by the maxFiles=4 bar
      rows.toDF("user_id", "event_id").repartition(8)
        .write.parquet(s"$root/hiveperiod=2024-01-01/dstrct_code=D0")
      root
    }

    def meanWorstSpan(root: String): (Double, Int) = {
      val leaf = s"$root/hiveperiod=2024-01-01/dstrct_code=D0"
      val audit = ClusteredWriter.auditLayout(
        spark.read.parquet(leaf), col("user_id"), col("event_id"))
        .collect().map(r => math.max(r.getDouble(2), r.getDouble(3)))
      (audit.sum / audit.length, audit.length)
    }

    // plain compaction: fewer files, but each spans the whole domain
    val plainRoot = fragmentedRoot()
    val plain = CompactionJob.run(spark, plainRoot, maxFiles = 4,
      targetFileBytes = 16L * 1024)
    assert(plain.verified && plain.compacted.nonEmpty)
    val (plainSpan, plainFiles) = meanWorstSpan(plainRoot)

    // clustered compaction: same crash-safe path, z-ordered output
    val zRoot = fragmentedRoot()
    val z = CompactionJob.run(spark, zRoot, maxFiles = 4,
      targetFileBytes = 16L * 1024, clusterBy = Some(("user_id", "event_id")))
    assert(z.verified && z.compacted.nonEmpty && z.rowsAfter == plain.rowsAfter)
    val (zSpan, zFiles) = meanWorstSpan(zRoot)

    assert(plainFiles > 1 && zFiles > 1,
      s"need multi-file output for the span metric to mean anything: $plainFiles/$zFiles")
    assert(plainSpan > 0.9, s"hash-repartitioned files span the domain: $plainSpan")
    assert(zSpan < 0.6 && zSpan < plainSpan / 1.5,
      s"z-ordered compaction must shrink the worst-dim span: $zSpan vs $plainSpan")
  }
}
