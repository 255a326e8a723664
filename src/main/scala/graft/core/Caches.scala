package graft.core

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.LogicalRDD

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

  private val trackedRdds = new ConcurrentLinkedQueue[RDD[_]]()

  /** `localCheckpoint` with the checkpoint block tracked for release.
    *
    * `Dataset.localCheckpoint()` persists the dataset's internal RDD
    * directly in the block manager, OUTSIDE the CacheManager — so
    * neither `Dataset.unpersist` nor `spark.catalog.clearCache()` ever
    * sees it, and in a long-lived session (a service loop, a 360-query
    * bench run) checkpoint blocks accumulate until storage memory
    * pressure degrades every later query. Measured: BENCH_r07's suite
    * total ran 512 s vs 48 s in r06 purely from this accumulation —
    * late-suite queries inflated up to 180× while their isolated times
    * were unchanged. Iterative builders must route every checkpoint
    * through here so [[releaseAll]] actually returns the session to
    * baseline. */
  def localCheckpointTracked[T](ds: Dataset[T]): Dataset[T] = {
    val cp = ds.localCheckpoint()
    checkpointRdd(cp).foreach(trackedRdds.add)
    cp
  }

  /** The persisted RDD behind a local-checkpointed Dataset: its
    * analyzed plan is a single `LogicalRDD` wrapping the checkpointed
    * (persisted) internal RDD. */
  private def checkpointRdd(ds: Dataset[_]): Option[RDD[_]] =
    ds.queryExecution.analyzed.collectFirst { case lr: LogicalRDD => lr.rdd }

  /** Eagerly drop a checkpoint block mid-loop (round N's block can be
    * freed the moment round N+1 is materialized — keeps an iterative
    * job's storage footprint at 2 rounds instead of all of them). Safe
    * to call on a Dataset whose block [[releaseAll]] will also sweep:
    * double-unpersist is a no-op. */
  def releaseCheckpoint(ds: Dataset[_]): Unit =
    checkpointRdd(ds).foreach { r =>
      try r.unpersist(blocking = false) catch { case _: Throwable => () }
    }

  /** Unpersist every tracked relation and checkpoint block
    * (non-blocking) and clear the registry. Safe to call at any query
    * boundary. One contract note: a local-checkpointed relation's
    * lineage is truncated, so unlike plain persists it CANNOT be
    * recomputed after release — callers must materialize (count /
    * write) results before the boundary, which is exactly what
    * Bench/Verify/service loops do. */
  def releaseAll(): Unit = {
    var df = tracked.poll()
    while (df != null) {
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () } // session may already be stopped
      df = tracked.poll()
    }
    var rdd = trackedRdds.poll()
    while (rdd != null) {
      try rdd.unpersist(blocking = false)
      catch { case _: Throwable => () }
      rdd = trackedRdds.poll()
    }
  }
}
