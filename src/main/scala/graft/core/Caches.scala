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

  /** Per-thread stack of SCOPED registries (see [[scoped]]). A deque,
    * not a single slot, so nested scopes (a gate whose verdict kernel
    * itself brackets a sub-phase) compose: each persist lands in the
    * innermost open scope. */
  private val scopes =
    new ThreadLocal[java.util.ArrayDeque[ConcurrentLinkedQueue[Dataset[_]]]] {
      override def initialValue() =
        new java.util.ArrayDeque[ConcurrentLinkedQueue[Dataset[_]]]()
    }

  private def registry: ConcurrentLinkedQueue[Dataset[_]] = {
    val s = scopes.get()
    if (s.isEmpty) tracked else s.peek()
  }

  /** Run `body` with its own PRIVATE tracked-persist registry and
    * release exactly those persists afterwards — on success OR failure
    * (review r16 / ADVICE r15: the gates' success-path-only releaseAll
    * leaked a pinned relation per retry of a poison batch, and the
    * session-GLOBAL sweep unpinned OTHER concurrent streams' in-flight
    * tracked caches mid-batch, silently re-running the double decode
    * the pin exists to avoid). Every maintainer/gate brackets its
    * micro-batch with this; [[releaseAll]] remains the query-boundary
    * sweep for single-driver harnesses (Bench, Verify, services).
    *
    * Scope residency is decided at [[persistTracked]] time on the
    * CALLING thread — foreachBatch bodies and the plans they build run
    * on the driver thread that opened the scope, so a gate's kernel
    * pins land in the gate's scope while a concurrent stream's land in
    * its own. Checkpoint blocks ([[localCheckpointTracked]]) stay
    * global: no gate kernel checkpoints, and truncated lineage must
    * never be released while a sibling scope could still reference it. */
  def scoped[T](body: => T): T = {
    val q = new ConcurrentLinkedQueue[Dataset[_]]()
    scopes.get().push(q)
    try body
    finally {
      scopes.get().pop(): Unit
      var df = q.poll()
      while (df != null) {
        try df.unpersist(blocking = false)
        catch { case _: Throwable => () }
        df = q.poll()
      }
    }
  }

  /** Persist `df` (MEMORY_AND_DISK) and track the handle for release —
    * in the innermost open [[scoped]] registry of this thread, or the
    * session-global one ([[releaseAll]]) outside any scope. */
  def persistTracked(df: DataFrame): DataFrame = {
    df.persist()
    registry.add(df)
    df
  }

  /** Typed-Dataset variant of [[persistTracked]] (iterative builders
    * that carry case-class state between rounds, e.g. BPE vocab). */
  def persistTrackedDs[T](ds: Dataset[T]): Dataset[T] = {
    ds.persist()
    registry.add(ds)
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
    // Iterative loops re-checkpoint relations derived from previous
    // checkpoints; the carried origin stats compound multiplicatively
    // per round until the driver stalls inside BigInteger products
    // during size estimation — see GraftPlanBridge.capCheckpointStats
    // (r19; measured 88 s of one PageRank round in stats math).
    org.apache.spark.sql.GraftPlanBridge.capCheckpointStats(cp)
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

  /** Unpersist every GLOBALLY tracked relation and checkpoint block
    * (non-blocking) and clear the registry — persists registered
    * inside a live [[scoped]] bracket are that scope's to release, so
    * a harness-level sweep can no longer unpin a concurrent stream's
    * in-flight batch. Safe to call at any query boundary. One contract note: a local-checkpointed relation's
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
