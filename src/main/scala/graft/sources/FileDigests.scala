package graft.sources

import java.util.{LinkedHashMap => JLinkedHashMap, Map => JMap}

import scala.util.control.NonFatal

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, GraftPlanBridge}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Content-addressed per-file cache for the store family's corpus
  * digests (VERDICT r16 next-2).
  *
  * Every store's freshness contract is the same order-independent
  * digest: `(count, bit_xor(xxhash64(key, value)))` over one offered
  * relation. Until r16 each check re-scanned the WHOLE offered corpus
  * per call — at the verdict store's design point (reports against a
  * 100 TB day-partitioned train corpus) the freshness scan IS a corpus
  * pass per report, the serve path's dominant and linearly-growing
  * term (the xvd curve's 2.6 → 4.3 s growth from sf0.1 → sf1 was
  * entirely digest scans).
  *
  * Both digest components are exactly decomposable per input FILE
  * (count sums; XOR composes with identity 0), so the digest of a
  * file-backed relation factors through per-file partial digests keyed
  * by the file's content address `(path, length, mtime)` — the same
  * invalidation signal Spark's own `FileStatusCache` trusts. A serve's
  * freshness check then costs:
  *
  *  - '''steady state''' (no corpus change since some prior digest):
  *    one directory LISTING, zero data scanned — flat in corpus size;
  *  - '''after churn''': one scan of exactly the NEW/CHANGED files
  *    (an appended ingest day = that day's files), composed with the
  *    cached partials of every unchanged file — O(changed data);
  *  - '''after a retire''': zero scans — the dropped files simply
  *    leave the composition.
  *
  * The fast path applies only when it is provably exact: the relation
  * must analyze to a chain of DETERMINISTIC Project/Filter steps over
  * ONE parquet [[HadoopFsRelation]] (the shape every store/table read
  * in the engine produces). Anything else — in-memory fixtures,
  * typed-map pipelines like the inline image hasher, nondeterministic
  * expressions whose per-file re-evaluation could diverge from the
  * original plan — falls back to the single whole-relation aggregate,
  * which is also the tear-safety arm: a PINNED nondeterministic batch
  * digests through its cache, never through a second file evaluation.
  *
  * Cached partials are keyed by (plan signature, hash expression,
  * file content address), where the plan signature renders the
  * Project/Filter chain and relation identity WITHOUT expression ids
  * (stable across re-constructions of the same logical read). A
  * changed file changes its content address, so its stale partial is
  * simply never looked up again — there is no invalidation protocol to
  * get wrong. The one aliasing caveat is inherited from every
  * mtime-based cache (Spark's included): an in-place byte edit that
  * preserves path, length AND mtime is invisible — unreachable through
  * Spark writers, which never rewrite a part-file in place.
  */
object FileDigests {

  /** LRU-bounded partial-digest cache: key → (n, xor). ~100 B/entry at
    * the cap — a few MB of driver memory for 64k files of provenance. */
  private val MaxEntries = 1 << 16
  private val cache = java.util.Collections.synchronizedMap(
    new JLinkedHashMap[String, (Long, Long)](1024, 0.75f, true) {
      override def removeEldestEntry(e: JMap.Entry[String, (Long, Long)]): Boolean =
        size() > MaxEntries
    })

  // Observability hooks (spec-pinned): how each digest was served.
  private[sources] val composedServes = new java.util.concurrent.atomic.LongAdder
  private[sources] val filesScanned = new java.util.concurrent.atomic.LongAdder
  private[sources] val fullScans = new java.util.concurrent.atomic.LongAdder
  private[sources] def clearForTest(): Unit = {
    cache.clear()
    composedServes.reset(); filesScanned.reset(); fullScans.reset()
  }

  /** The digest `(count(*), bit_xor(hash))` of `df`, served from the
    * per-file cache when the plan decomposes (see object doc), by one
    * whole-relation aggregate otherwise. Byte-identical to the
    * aggregate either way — FileDigestsSpec pins the equality on
    * partitioned, filtered and projected reads. */
  def digestOf(df: DataFrame, hash: Column): (Long, Long) = {
    val served =
      try perFile(df, hash)
      catch {
        case NonFatal(e) =>
          System.err.println(
            s"[filedigests] per-file path failed (${e.getMessage}) — whole-relation scan")
          None
      }
    served.getOrElse { fullScans.increment(); fullScan(df, hash) }
  }

  private def fullScan(df: DataFrame, hash: Column): (Long, Long) = {
    val r = df.agg(
      count(lit(1)).as("n"),
      coalesce(call_function("bit_xor", hash), lit(0L)).as("dg"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** The deterministic Project/Filter chain over one parquet relation,
    * or None when the plan has any other shape. Ambiguous output names
    * anywhere in the chain are rejected: the cache key renders
    * expressions by NAME, and a shadowed name could let two different
    * plans share a key. */
  private def decompose(plan: LogicalPlan): Option[LogicalRelation] = {
    def distinctNames(p: LogicalPlan): Boolean = {
      val n = p.output.map(_.name.toLowerCase(java.util.Locale.ROOT))
      n.distinct.size == n.size
    }
    plan match {
      case p: Project if p.projectList.forall(_.deterministic) && distinctNames(p) =>
        decompose(p.child)
      case f: Filter if f.condition.deterministic => decompose(f.child)
      case s: SubqueryAlias => decompose(s.child)
      case r: LogicalRelation => r.relation match {
        case h: HadoopFsRelation
            if h.fileFormat.isInstanceOf[ParquetFileFormat] &&
              h.location.isInstanceOf[PartitioningAwareFileIndex] &&
              h.location.rootPaths.size == 1 && distinctNames(r) =>
          Some(r)
        case _ => None
      }
      case _ => None
    }
  }

  /** Stable signature of (plan steps, relation identity, hash expr) —
    * rendered without expression ids so it survives re-analysis of the
    * same logical read. `sql` on a resolved expression prints names,
    * not ids; the unresolved hash column prints its tree. */
  private def planSig(plan: LogicalPlan, rel: LogicalRelation,
      fsRel: HadoopFsRelation, hash: Column): String = {
    def steps(p: LogicalPlan): List[String] = p match {
      case pr: Project => s"P:${pr.projectList.map(_.sql).mkString(",")}" :: steps(pr.child)
      case f: Filter => s"F:${f.condition.sql}" :: steps(f.child)
      case s: SubqueryAlias => steps(s.child)
      case _ => Nil
    }
    (steps(plan) :+
      s"R:${fsRel.location.rootPaths.head}" :+
      s"D:${fsRel.dataSchema.catalogString}" :+
      s"PS:${fsRel.partitionSchema.catalogString}" :+
      s"O:${(fsRel.options -- Seq("path", "paths")).toSeq.sorted.mkString(",")}" :+
      // Column.toString is the stable rendering — the bridged catalyst
      // tree prints parse-site Origins (stack-trace object hashes),
      // which would make every call a cache miss
      s"H:$hash").mkString("|")
  }

  private def perFile(df: DataFrame, hash: Column): Option[(Long, Long)] = {
    if (!GraftColumnBridge.expression(hash).deterministic) return None
    val analyzed = GraftPlanBridge.analyzed(df)
    decompose(analyzed).map { rel =>
      val fsRel = rel.relation.asInstanceOf[HadoopFsRelation]
      val sig = planSig(analyzed, rel, fsRel, hash)
      val files = fsRel.location.asInstanceOf[PartitioningAwareFileIndex].allFiles()
      def keyOf(f: FileStatus): String =
        s"$sig§${f.getPath}@${f.getLen}@${f.getModificationTime}"
      val known = files.map(f => (f, Option(cache.get(keyOf(f)))))
      val missing = known.collect { case (f, None) => f }
      val scanned: Map[String, (Long, Long)] =
        if (missing.isEmpty) Map.empty
        else scanFiles(df.sparkSession, analyzed, rel, fsRel, missing, hash)
      if (missing.nonEmpty) {
        if (sys.env.contains("GRAFT_DIGEST_DEBUG"))
          System.err.println(s"[filedigests-debug] scan ${missing.size} sig=$sig")
        filesScanned.add(missing.size.toLong)
        missing.foreach { f =>
          val d = scanned.getOrElse(f.getPath.toString, (0L, 0L))
          cache.put(keyOf(f), d): Unit
        }
      } else composedServes.increment()
      known.foldLeft((0L, 0L)) { case ((n, x), (f, hit)) =>
        val d = hit.getOrElse(scanned.getOrElse(f.getPath.toString, (0L, 0L)))
        (n + d._1, x ^ d._2)
      }
    }
  }

  /** Per-file partial digests of exactly `missing`, by transplanting
    * the original plan onto a read restricted to those files: the
    * restricted scan re-derives partition values from its paths
    * (explicit schema + basePath, the readEvidence pattern), the
    * original Filter/Project expressions execute verbatim with their
    * attributes remapped onto the new relation, and one
    * `groupBy(input_file_name())` aggregate lands every file's partial
    * in a single job. A file whose rows are all filtered away (or that
    * is empty) produces no group and digests as the (0, 0) identity —
    * exactly its contribution to the whole-relation aggregate. */
  private def scanFiles(spark: org.apache.spark.sql.SparkSession,
      analyzed: LogicalPlan, rel: LogicalRelation, fsRel: HadoopFsRelation,
      missing: Seq[FileStatus], hash: Column): Map[String, (Long, Long)] = {
    val dataNames = fsRel.dataSchema.fieldNames.toSet
    val schema = StructType(fsRel.dataSchema.fields ++
      fsRel.partitionSchema.fields.filterNot(f => dataNames.contains(f.name)))
    var reader = spark.read.schema(schema)
      .options(fsRel.options -- Seq("path", "paths"))
    if (fsRel.partitionSchema.nonEmpty)
      reader = reader.option("basePath", fsRel.location.rootPaths.head.toString)
    val restricted = reader.parquet(missing.map(_.getPath.toString): _*)
    val newLeaf = GraftPlanBridge.analyzed(restricted)
    val byName = newLeaf.output.map(a => a.name -> a).toMap
    val mapping = rel.output.map(a => a.exprId -> byName(a.name)).toMap
    val transplanted = analyzed
      .transformUp { case r: LogicalRelation if r eq rel => newLeaf }
      .transformAllExpressions {
        case a: AttributeReference => mapping.getOrElse(a.exprId, a)
      }
    GraftPlanBridge.ofRows(spark, transplanted)
      .groupBy(input_file_name().as("_file"))
      .agg(count(lit(1)).as("n"),
        coalesce(call_function("bit_xor", hash), lit(0L)).as("dg"))
      .collect()
      .map(r => new Path(r.getString(0)).toString -> (r.getLong(1), r.getLong(2)))
      .toMap
  }
}
