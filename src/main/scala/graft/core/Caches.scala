package graft.core

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, Dataset}

/** Registry for DataFrames that query builders persist internally
  * (shingle sets, fingerprint relations, interval-join probe sides).
  *
  * Those persists are load-bearing — each one replaces a repeated corpus
  * scan — but the handle is private to the builder, so a caller could
  * never unpersist them: in a long-lived session the cached relations
  * would accumulate until LRU eviction. Builders register every persist
  * here; harnesses and services bracket each query with [[releaseAll]]
  * (cheap no-op when nothing was tracked). `spark.catalog.clearCache()`
  * also works but nukes caches the CALLER may own; this releases exactly
  * what graft itself pinned.
  */
object Caches {
  private val tracked = new ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `df` (MEMORY_AND_DISK) and track the handle for release. */
  def persistTracked(df: DataFrame): DataFrame = {
    df.persist()
    tracked.add(df)
    df
  }

  /** Typed-Dataset variant of [[persistTracked]] (iterative builders
    * that carry case-class state between rounds, e.g. BPE vocab). */
  def persistTrackedDs[T](ds: Dataset[T]): Dataset[T] = {
    ds.persist()
    tracked.add(ds)
    ds
  }

  /** Unpersist every tracked relation (non-blocking) and clear the
    * registry. Safe to call at any query boundary. */
  def releaseAll(): Unit = {
    var df = tracked.poll()
    while (df != null) {
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () } // session may already be stopped
      df = tracked.poll()
    }
  }
}
