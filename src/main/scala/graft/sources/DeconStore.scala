package graft.sources

import scala.util.control.NonFatal

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build-once / probe-daily store for eval-set decontamination
  * (q172–q175) — the operational shape: a benchmark suite changes
  * rarely while training batches arrive daily, so the eval side's
  * derived relations are computed once and every batch probes them.
  *
  * Layout under one root:
  * {{{
  *   <dir>/fps/    (fp)              distinct eval winnow fingerprints
  *   <dir>/grams/  (g)               distinct RAW K-char eval grams
  *   <dir>/meta/   (n_docs, digest)  commit point, lands LAST
  * }}}
  *
  * Raw grams (not hashes) are stored deliberately: the eval side is
  * benchmark-sized (MBs against TBs of train), so 40 bytes/gram is
  * affordable, and raw keys keep the probe inside the DuckDB oracle's
  * exactness contract (q175 is oracle-green through this store); a
  * deployment that wants 8-byte keys hashes the stored grams at read
  * time — an eval-sized map, not a re-gram of anything.
  *
  * Freshness is [[SignatureStore.digestOf]] over the offered eval
  * corpus, exactly the TokenizerStore contract (global rebuild per
  * eval-suite change; no day partitions — benchmarks don't arrive
  * daily). A stale or unreadable store costs inline recompute, never
  * a wrong span. Unlike the sibling stores the GRAM relation is what
  * makes this one pay: without it every daily batch re-explodes the
  * eval corpus's positions; with it the probe's eval side is a
  * pre-distinct broadcast-sized relation read straight from parquet.
  */
object DeconStore {

  /** Session conf: root dir of the store. Unset (default) = no store. */
  val DirKey = "spark.graft.deconstore.dir"

  /** Session conf: skip the digest freshness scan and trust the store. */
  val TrustKey = "spark.graft.deconstore.trust"

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  /** Build the store from the eval corpus, replacing prior content.
    * Meta lands LAST — the commit point; a torn build is unreadable
    * and rejected by [[openFresh]]. */
  def build(evalRel: DataFrame, dir: String): Unit = {
    val spark = evalRel.sparkSession
    fs(spark, dir).delete(new Path(dir), true): Unit
    // Pinned across the three derivations (fps, grams, digest) so a
    // non-deterministic eval plan cannot tear the store — same
    // argument as WinnowStore.writeDay.
    val pinned = evalRel.persist()
    try {
      graft.operators.SubstringDedup.charWinnowOf(pinned)
        .select("fp").distinct()
        .write.parquet(s"$dir/fps")
      graft.operators.SubstringDedup.rawGramsOf(pinned)
        .select("g").distinct()
        .write.parquet(s"$dir/grams")
      val (n, dg) = SignatureStore.digestOf(pinned)
      spark.createDataFrame(Seq((n, dg))).toDF("n_docs", "digest")
        .coalesce(1).write.parquet(s"$dir/meta")
    } finally pinned.unpersist(blocking = false): Unit
  }

  /** The stored (fps, grams) pair IF configured and fresh for this
    * exact eval corpus — None (driver-log line, never an error) on key
    * unset, unreadable store, or digest mismatch. */
  def openFresh(evalRel: DataFrame): Option[(DataFrame, DataFrame)] = {
    val spark = evalRel.sparkSession
    val dir = spark.conf.get(DirKey, "")
    if (dir.isEmpty) return None
    try {
      val m = spark.read.parquet(s"$dir/meta").head()
      val stored = (m.getLong(0), m.getLong(1))
      val trusted = spark.conf.get(TrustKey, "false").toBoolean
      if (!trusted && SignatureStore.digestOf(evalRel) != stored) {
        System.err.println(s"[deconstore] $dir is stale for this eval corpus — recomputing inline")
        None
      } else Some((spark.read.parquet(s"$dir/fps"),
        spark.read.parquet(s"$dir/grams")))
    } catch {
      case NonFatal(e) =>
        System.err.println(s"[deconstore] $dir unreadable (${e.getMessage}) — recomputing inline")
        None
    }
  }
}
