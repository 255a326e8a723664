package graft.core

import java.util.concurrent.ConcurrentHashMap

/** JVM-exit cleanup for scratch directories whose lifetime outlives the
  * method that created them.
  *
  * q148's per-query signature store is the motivating case: the query
  * BUILDS a store under `java.io.tmpdir` at plan-construction time, but
  * the returned DataFrame reads the store's parquet lazily at EXECUTION
  * time — so a `finally`-block delete would yank the files out from
  * under the not-yet-run plan (Verify writes the result long after the
  * builder returns). Deleting at JVM exit keeps the lazy-plan contract
  * while fixing the leak: before this, every JVM run left a full store
  * per invocation in the temp dir (the PID suffix that fixed concurrent
  * overwrites also defeated the old fixed-path reuse).
  *
  * `File.deleteOnExit` can't do this — it handles single files, in
  * reverse-registration order, with no recursion. One shutdown hook,
  * registered lazily, sweeps every registered root recursively; paths
  * register idempotently (a re-run of the same query re-registers the
  * same PID-suffixed path into the set).
  */
object TempCleanup {
  private val roots = ConcurrentHashMap.newKeySet[String]()
  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => {
      roots.forEach { p => try rm(new java.io.File(p)) catch { case _: Throwable => () } }
    }, "graft-temp-cleanup"))

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
    f.delete(): Unit
  }

  /** Register a directory for recursive deletion at JVM exit. */
  def registerForExit(path: String): Unit = {
    hook
    roots.add(path): Unit
  }
}
