package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Filesystem owner lease with a fencing epoch — the store family's
  * cross-process single-writer contract as MECHANISM instead of prose
  * (VERDICT r16 next-5).
  *
  * Every store in the family assumes one maintainer owner per store
  * root; within one JVM the per-dir monitors serialize the faces, but
  * ACROSS processes the contract was documentation only. The verdict
  * store is where a violation is most expensive: its two maintainer
  * faces write one root, and an unserialized foreign writer can
  * produce the fresh-but-WRONG state (committed metas whose evidence
  * a concurrent retire deleted) that the commit protocol exists to
  * forbid.
  *
  * Protocol — classic fencing tokens on an atomic-create filesystem:
  *
  *  - [[acquire]] lists `<dir>/_lease/`, takes max epoch E, and
  *    atomically creates `epoch-(E+1)` (`FileSystem.create` with
  *    overwrite = false — exclusive on HDFS and local FS; two racing
  *    acquirers cannot both win an epoch, the loser retries above it).
  *    The winning epoch is registered JVM-locally as this process's
  *    held lease for `dir`.
  *  - [[checkWrite]] runs at every store commit point: a holder whose
  *    epoch is no longer the maximum has been FENCED by a newer owner
  *    and fails loud (its in-flight work must not commit); a
  *    non-holder writing to a leased store fails loud too. A store
  *    with no lease dir stays in the legacy convention (single writer
  *    by deployment discipline) so existing single-process pipelines
  *    run unchanged.
  *
  * Takeover procedure (documented contract): a new owner simply calls
  * [[acquire]] — it needs no cooperation from a dead writer; the old
  * owner's next commit-point check fails loud and its partial work is
  * invisible by the stores' own commit protocol (meta last / delete
  * first ⇒ stale, never wrong). Epoch files are tiny and monotonic;
  * [[release]] removes the holder's file when a maintainer retires
  * cleanly, and acquire's listing tolerates gaps.
  */
object StoreLease {

  private val held = new java.util.concurrent.ConcurrentHashMap[String, Long]()

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  private def leaseDir(dir: String) = new Path(s"$dir/_lease")

  private def maxEpoch(spark: SparkSession, dir: String): Long = {
    val f = fs(spark, dir)
    val d = leaseDir(dir)
    if (!f.exists(d)) 0L
    else f.listStatus(d).iterator
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("epoch-") => n.drop(6).toLong }
      .foldLeft(0L)(math.max)
  }

  /** Acquire (or re-acquire) ownership of `dir`'s store: wins the next
    * fencing epoch and fences every prior owner. Returns the epoch. */
  def acquire(spark: SparkSession, dir: String, owner: String = ""): Long = {
    val f = fs(spark, dir)
    var epoch = maxEpoch(spark, dir) + 1
    var won = false
    while (!won) {
      try {
        val out = f.create(new Path(leaseDir(dir), f"epoch-$epoch%020d"), false)
        try out.write(
          s"$owner pid=${ProcessHandle.current().pid()}".getBytes("UTF-8"))
        finally out.close()
        won = true
      } catch {
        case _: java.io.IOException => epoch += 1 // lost the race; bid above
      }
    }
    held.put(dir, epoch): Unit
    epoch
  }

  /** Release a cleanly-retiring owner's lease. A crashed owner never
    * releases — the next owner fences it via [[acquire]]. */
  def release(spark: SparkSession, dir: String): Unit =
    Option(held.remove(dir)).foreach { e =>
      fs(spark, dir).delete(new Path(leaseDir(dir), f"epoch-$e%020d"), false): Unit
    }

  /** Commit-point check, called by the stores' write paths. Loud on
    * both violations: a fenced former owner, and a lease-less writer
    * against a leased store. No-op for unleased stores (legacy
    * single-writer-by-convention deployments). */
  def checkWrite(spark: SparkSession, dir: String): Unit = {
    val cur = maxEpoch(spark, dir)
    Option(held.get(dir)) match {
      case Some(mine) =>
        require(cur <= mine,
          s"store $dir: this writer (lease epoch $mine) was FENCED by a newer " +
            s"owner (epoch $cur) — a second maintainer took the store over; " +
            "this process must stop writing to it")
      case None =>
        require(cur == 0L,
          s"store $dir is lease-owned (epoch $cur) by another process — " +
            "writing without the lease would violate the single-writer " +
            "contract; StoreLease.acquire the store to take it over")
    }
  }

  /** Delete a store's CONTENT but keep its owner lease — a rebuild is
    * a mutation by the same owner, not a change of ownership. The
    * store builds all use this instead of a recursive root delete. */
  def replaceContents(spark: SparkSession, dir: String): Unit = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (f.exists(p))
      f.listStatus(p).filterNot(_.getPath.getName == "_lease")
        .foreach(s => f.delete(s.getPath, true): Unit)
  }

  /** Test hook: make this JVM forget it holds `dir` (simulates a fresh
    * foreign process observing the on-disk lease). */
  private[sources] def forgetForTest(dir: String): Unit = {
    held.remove(dir): Unit
  }
}
