package graft.sources

import scala.util.control.NonFatal

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incrementally-maintained store for the PER-DOC DECONTAMINATION
  * VERDICTS themselves — the tier above the per-eye artifact stores
  * (VERDICT r15 next-1: every decon INDEX was store-served —
  * [[DeconStore]] grams, [[SemanticDeconStore]] codebook+assignments,
  * [[MediaHashStore]] hashes — but the per-doc verdict relation
  * q196/q198 report was recomputed by a full three-kernel corpus
  * sweep per invocation, the one operation that still rescanned
  * history every time a model card wanted the suite-wide report).
  *
  * '''What is stored: per-eye EVIDENCE, not final verdicts.''' The
  * three eyes' verdicts all factor as kernel (expensive, corpus ×
  * suite) → match-sized evidence relation → per-doc rollup
  * ([[graft.streaming.DeconGate]]'s `flagFromSpans` /
  * `flagSemanticFromMatches` / `flagMediaFromPairs`). Final verdicts
  * do NOT decompose by benchmark (a doc's `keep` is a conjunction
  * over the whole suite; gram spans merge islands ACROSS benchmarks),
  * but the evidence one level down does, exactly:
  *
  *  - '''gram eye''': matched POSITIONS (doc_id, p). A position
  *    matches the suite iff its K-gram occurs in SOME benchmark, so
  *    the distinct union of per-benchmark position relations equals
  *    the whole-suite relation, and
  *    [[graft.operators.SubstringDedup.spansFromPositions]] over it
  *    reproduces the inline spans byte-for-byte.
  *  - '''semantic eye''': matches (doc_id, eval_doc, sim) at τ. Each
  *    pair names one eval doc, eval docs partition by benchmark, so
  *    per-benchmark relations union losslessly. Assignment rides the
  *    store's FROZEN codebook ([[SemanticDeconStore]]'s
  *    batch-independence argument), frozen at [[build]].
  *  - '''media eye''': pairs (doc_id, eval_doc, hamming) ≤ radius.
  *    Pigeonhole-exact banding — per-benchmark union is the exact
  *    whole-suite pair set.
  *
  * Because the serve path rolls stored evidence up through the SAME
  * DeconGate rollup code the inline gate uses, store ≡ inline is a
  * property of construction (VerdictStoreSpec pins it byte-for-byte
  * on q196 and q198 under a first-K codebook).
  *
  * '''Evidence is keyed (benchmark, day)''', which is what makes both
  * churn directions incremental:
  *
  *  - '''ingest''' ([[advanceDay]], streamed by
  *    [[graft.streaming.VerdictMaintainer]]): probe ONE batch against
  *    the live suite, append `src=d<day>` partitions. Nothing
  *    rescales with stored history.
  *  - '''suite edit''' ([[advanceBenchmark]]/[[retireBenchmark]],
  *    streamed by the same maintainer's suite-edit face): a RETIRED
  *    benchmark's flags clear by dropping its evidence partitions —
  *    zero probes, the remaining evidence re-rolls up; an ADVANCED
  *    benchmark probes history ONCE against the new benchmark alone
  *    (corpus × delta, not corpus × suite), its evidence split back
  *    into the `src=d<day>` partitions it belongs to (so a later
  *    [[retireDay]]/re-advance of any day stays exact).
  *
  * Layout under one root:
  * {{{
  *   <dir>/params/                 (tau, max_hamming)   frozen at build
  *   <dir>/codebook/               (c_id, cv)           frozen at build
  *   <dir>/ev_gram/bench=B/src=dN/ (doc_id, p)
  *   <dir>/ev_sem/bench=B/src=dN/  (doc_id, eval_doc, sim)
  *   <dir>/ev_img/bench=B/src=dN/  (doc_id, eval_doc, hamming)
  *   <dir>/base/day=N/             (doc_id, in_txt, in_emb, in_img)
  *   <dir>/suite_meta/bench=B/     (n/dg per modality)  bench commit, LAST
  *   <dir>/day_meta/day=N/         (n/dg per modality)  day commit, LAST
  * }}}
  *
  * Freshness ([[openFreshThreeEye]]/[[openFreshTwoEye]]): XOR-composed
  * per-day metas must equal the OFFERED train corpus's digests and
  * XOR-composed per-benchmark metas the offered suite's — one hash
  * scan per offered relation, no probe, no decode (the train img side
  * is digested over HASHES, which q197/q198's callers already hold
  * via [[MediaHashStore]]'s dispatch). Stale/missing/torn ⇒ None —
  * the caller recomputes inline: cost, never a missed pair. Commit
  * points: metas land LAST on advance and are deleted FIRST on
  * retire, so a crash in either direction leaves the store stale (→
  * inline), never wrong, and every advance is retire-then-write
  * convergent under replay.
  */
object VerdictStore {

  /** Session conf: root dir of the store. Unset (default) = no store. */
  val DirKey = "spark.graft.verdictstore.dir"

  /** Session conf: skip the digest freshness scans and trust the
    * store. A verdict store's freshness IS its correctness signal (a
    * stale serve silently misreports contamination) — set only where
    * pipeline ordering provably advances the store before any report
    * runs (the [[MediaHashStore.TrustFreshKey]] argument). */
  val TrustKey = "spark.graft.verdictstore.trust"

  /** Session conf prefix for the serve-arm signal (r17 advice): every
    * store-or-inline dispatch site stamps `<prefix><face>` with
    * "store" or "inline" after choosing, so report consumers can tell
    * STRUCTURALLY which arm produced a relation. The arms are
    * result-identical only under the first-K fixture convention — a
    * deployed store serves semantic verdicts under its FROZEN trained
    * codebook, while the inline fallback derives first-K from
    * train ∪ suite, so near-τ verdicts can legitimately differ by arm
    * and a consumer comparing reports across runs must compare
    * like-armed runs (or pin `trained = false`). */
  val ArmKeyPrefix = "spark.graft.verdictstore.arm."

  /** Stamp which arm served `face` (a query id like "q198"). */
  def recordArm(spark: SparkSession, face: String, arm: String): Unit =
    spark.conf.set(ArmKeyPrefix + face, arm)

  /** One corpus side's three modality relations: `txt` (doc_id, text),
    * `emb` (vec_id, embedding), `img` (media_id, dhash) — the img side
    * already HASHED, because hashing is the decode-bearing step that
    * happens once at ingest ([[MediaHashStore]]'s contract) and this
    * store never touches a payload byte. */
  final case class Corpus(txt: DataFrame, emb: DataFrame, img: DataFrame)

  /** Per-store-dir mutation lock (review r16 finding 1). This store is
    * the one in the family with TWO maintainer faces writing the same
    * root (ingest days and suite edits): unserialized, a suite
    * advance's retire-first could delete an in-flight day advance's
    * just-written evidence AFTER its digest check, and once both metas
    * commit the store reads FRESH but is missing that (benchmark, day)
    * evidence — a fresh-but-WRONG serve, the one state the commit
    * protocol exists to forbid. Both faces run in one driver JVM in
    * the advertised topology (two streams, one SparkSession), so a
    * per-dir monitor serializes them; ACROSS processes the
    * single-writer contract is mechanized by [[StoreLease]] (r17):
    * every mutator checks the fencing epoch at its commit point, so a
    * second writer fails loud instead of racing — reads need no lock,
    * they see only committed metas. */
  private val dirLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(dir: String): Object =
    dirLocks.computeIfAbsent(dir, _ => new Object)

  /** Benchmark names splice into partition paths (`bench=<name>`), so
    * a name containing the partition separator would write under one
    * path and be read back truncated at the first '=' — the digest
    * composition (file contents) would still MATCH while the evidence
    * lookup misses, serving keep=true for contaminated docs (review
    * r16 finding 3). '%' is rejected for the same reason one layer
    * down (r17 advice): paths are written RAW but Spark's partition
    * discovery URL-unescapes values on read, so 'mmlu%3Dv2' reads back
    * as 'mmlu=v2' and the serve-side isin filter misses every pair of
    * that benchmark while the content digests still pass — the same
    * fresh-but-under-reporting class. Fail loud at write time instead. */
  private def requireSafeBenchName(name: String): Unit =
    require(name.nonEmpty &&
        !name.exists(c => c == '=' || c == '/' || c == '\\' || c == '%'),
      s"benchmark name '$name' cannot be used in a bench= partition path " +
        "(must be non-empty and contain no '=', '/', '\\' or '%')")

  /** A benchmark listed twice would pass every per-name meta check and
    * append its sem/img evidence twice — keep flags survive (gram is
    * rescued by the serve-side distinct()), but n_eval_hits /
    * n_image_hits the reports publish would double-count (r17 advice). */
  private def requireDistinctSuite(suite: Seq[(String, Corpus)], dir: String): Unit = {
    val dup = suite.map(_._1).groupBy(identity).collect { case (n, vs) if vs.size > 1 => n }
    require(dup.isEmpty,
      s"verdict store $dir: benchmark(s) ${dup.mkString(", ")} listed more than " +
        "once in the offered suite — duplicate evidence would inflate hit counts")
  }

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  /** The three per-modality digests of one corpus side — (n, xor) per
    * eye, each subset-decomposable so day/bench partitions compose. */
  private def digests(c: Corpus): ((Long, Long), (Long, Long), (Long, Long)) =
    (SignatureStore.digestOf(c.txt), VectorIndexStore.digestOf(c.emb),
      MediaHashStore.digestOf(c.img))

  /** Maintainer-write digests of a PINNED corpus: whole-relation
    * aggregates that honor the persist, never the per-file cache — a
    * committed meta must describe the snapshot the just-written
    * evidence derived from, and the per-file path re-reads disk behind
    * the pin (ADVICE r17; [[FileDigests.digestOfPinned]]). */
  private def digestsPinned(c: Corpus): ((Long, Long), (Long, Long), (Long, Long)) =
    (SignatureStore.digestOfPinned(c.txt), VectorIndexStore.digestOfPinned(c.emb),
      MediaHashStore.digestOfPinned(c.img))

  /** Meta rows are the stores' COMMIT points, and the probe between a
    * mutator's entry check and its meta write is long — re-check the
    * lease immediately before committing so a writer fenced mid-probe
    * fails loud HERE instead of committing metas over a new owner's
    * content (ADVICE r17). The residual window is one FS write: a fence
    * landing inside it still reads as stale (digest backstop), never
    * wrong. */
  private def writeMetaRow(spark: SparkSession, dir: String, path: String,
      d: ((Long, Long), (Long, Long), (Long, Long))): Unit = {
    StoreLease.checkWrite(spark, dir)
    spark.createDataFrame(Seq(
        (d._1._1, d._1._2, d._2._1, d._2._2, d._3._1, d._3._2)))
      .toDF("n_txt", "dg_txt", "n_emb", "dg_emb", "n_img", "dg_img")
      .coalesce(1).write.parquet(path)
  }

  // ------------------------------------------------------- build

  /** Build a fresh store, replacing prior content: freeze the
    * semantic codebook and the probe parameters, commit each
    * benchmark's suite meta (no evidence yet — zero live days), then
    * [[advanceDay]] the initial corpus as `day` (default -1, the
    * maintainer backfill convention — outside a stream's batch-id
    * range).
    *
    * The codebook freezes from `codebookFrom` (a reference corpus) or
    * train ∪ suite embeddings; `trained = true` (the default — the
    * sibling stores' r16 production setting) runs the k-means job,
    * first-K (`trained = false`) is the explicit fixture convention
    * parity specs pin against (the inline gate derives the union's
    * first-K codebook). τ and the hamming radius freeze HERE and every
    * advance reads them back — per-advance parameters would mix
    * thresholds inside one evidence relation and serve garbage. */
  def build(train: Corpus, suite: Seq[(String, Corpus)], dir: String,
      day: Int = -1, codebookFrom: Option[DataFrame] = None,
      trained: Boolean = true,
      tau: Double = graft.operators.SimilarityQueries.SemDeconTau,
      maxHamming: Int = graft.operators.MediaQueries.MaxHamming): Unit = {
    require(suite.nonEmpty, s"verdict store $dir: empty benchmark suite")
    requireDistinctSuite(suite, dir)
    suite.foreach { case (name, _) => requireSafeBenchName(name) }
    val spark = train.txt.sparkSession
    lockFor(dir).synchronized {
    StoreLease.checkWrite(spark, dir)
    StoreLease.replaceContents(spark, dir)
    spark.createDataFrame(Seq((tau, maxHamming)))
      .toDF("tau", "max_hamming")
      .coalesce(1).write.parquet(s"$dir/params")
    val src = codebookFrom.getOrElse(
      train.emb.unionByName(suite.map(_._2.emb).reduce(_ unionByName _)))
    val cents =
      if (trained) graft.operators.SimilarityQueries
        .trainedCodebook(src, graft.operators.SimilarityQueries.NumCentroids)
      else graft.operators.SimilarityQueries.centroidList(src)
    require(cents.nonEmpty,
      s"verdict store $dir: codebook source has no vec_id below the codebook size")
    spark.createDataFrame(cents).toDF("c_id", "cv")
      .coalesce(1).write.parquet(s"$dir/codebook")
    suite.foreach { case (name, c) =>
      // Write path: aggregate digests, never the per-file cache — the
      // uniform maintainer-commit rule (FileDigests.digestOfPinned).
      writeMetaRow(spark, dir, s"$dir/suite_meta/bench=$name", digestsPinned(c))
    }
    advanceDay(train, suite, dir, day)
    }
  }

  /** The stored frozen codebook — K driver rows (bounded by the
    * codebook convention, never corpus-sized). */
  def storedCodebook(spark: SparkSession, dir: String): Seq[(Long, Seq[Double])] =
    spark.read.parquet(s"$dir/codebook")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq

  private def storedParams(spark: SparkSession, dir: String): (Double, Int) = {
    val r = spark.read.parquet(s"$dir/params").head()
    (r.getDouble(0), r.getInt(1))
  }

  // ------------------------------------------------- probe kernels

  /** Probe one batch against ONE benchmark with the frozen artifacts:
    * the three eyes' evidence relations, each the inline kernel's own
    * plan. */
  private def probe(batch: Corpus, bench: Corpus,
      cents: Seq[(Long, Seq[Double])], tau: Double, maxHamming: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val sq = graft.operators.SimilarityQueries
    val gram = graft.operators.SubstringDedup
      .deconPositionsOn(batch.txt, bench.txt)
    val sem = sq.semanticDeconVia(batch.emb, cents,
      sq.multiAssignWithNv(bench.emb, cents), tau)
    val img = graft.multimodal.MediaDedup
      .deconPairs(batch.img, bench.img, maxHamming)
    (gram, sem, img)
  }

  private def writeEvidence(dir: String, eye: String, bench: String,
      ev: DataFrame): Unit =
    ev.write.mode("append").partitionBy("src")
      .parquet(s"$dir/ev_$eye/bench=$bench")

  // --------------------------------------------------- day advance

  /** Append one ingest day: probe the batch against every live
    * benchmark (whose offered relations must digest-match the stored
    * suite metas — a drifted suite would mix evidence from two
    * different suites into one store, a WRONG future serve, so the
    * mismatch fails loud instead of demoting), write its evidence,
    * base and day meta (commit point, LAST). Idempotent per day
    * (unconditional retire-then-write) so at-least-once replay
    * converges.
    *
    * Cost shape per batch: one batch winnow (cached across benchmark
    * probes — equal plans hit the CacheManager), one batch codebook
    * assignment per benchmark (K dots/vector over the pinned batch),
    * one batch band join per benchmark against the broadcast
    * benchmark-sized eval side — nothing scales with stored history. */
  def advanceDay(batch: Corpus, suite: Seq[(String, Corpus)], dir: String,
      day: Int): Unit = lockFor(dir).synchronized {
    requireDistinctSuite(suite, dir)
    val spark = batch.txt.sparkSession
    StoreLease.checkWrite(spark, dir)
    retireDay(spark, dir, day)
    val cents = storedCodebook(spark, dir)
    val (tau, maxHamming) = storedParams(spark, dir)
    // One meta read for the whole batch (review r16 finding 6: reading
    // it per benchmark made every micro-batch O(B²) in driver-side
    // parquet opens) — the metas cannot change mid-call, the dir lock
    // holds.
    val storedMetas = readMetas(spark, s"$dir/suite_meta", "bench")
    // The offered suite must name EVERY stored benchmark, not just be
    // a subset of it (r17 advice, high): an ingest face whose captured
    // `suite` predates a concurrent advanceBenchmark would otherwise
    // probe this day against the smaller suite, commit its day meta,
    // and the store would read FRESH while that (benchmark, day)
    // evidence is absent — keep=true for docs contaminated against the
    // unprobed benchmark, the exact fresh-but-wrong state the commit
    // protocol forbids. (Offered-but-not-stored already fails below.)
    val unoffered = storedMetas.map(_._1).toSet -- suite.map(_._1).toSet
    require(unoffered.isEmpty,
      s"verdict store $dir holds live benchmark(s) ${unoffered.mkString(", ")} " +
        "the offered suite does not name — a day advanced without probing them " +
        "would serve fresh-but-wrong verdicts; re-wire the ingest face with the " +
        "current suite (or retire the benchmark first)")
    graft.core.Caches.scoped {
      val pinned = Corpus(batch.txt.persist(), batch.emb.persist(),
        batch.img.persist())
      try {
        suite.foreach { case (name, bench) =>
          // The check-vs-probe coherence here deliberately does NOT pin
          // the benchmark (measured r18: persisting the bench corpus
          // cost 2–3× on this hot maintainer face at sf0.1, 7.8 →
          // 26.6 s). It doesn't need to: the digest below and the probe
          // read the SAME frozen file listing inside `bench`'s analyzed
          // relations, so a file replaced mid-call fails BOTH loudly
          // (FileNotFound) rather than diverging, and the only silent
          // divergence is an in-place byte edit preserving (path, len,
          // mtime) — the documented FileDigests caveat, unreachable
          // through Spark writers. Contrast advanceBenchmark, which
          // COMMITS a meta digest derived from its bench and therefore
          // does pin (ADVICE r17).
          val offered = digests(bench)
          val stored = storedMetas
            .find(_._1 == name)
            .getOrElse(sys.error(
              s"verdict store $dir has no live benchmark '$name' — advance the suite first"))
          require(offered == stored._2,
            s"verdict store $dir: offered relations for benchmark '$name' do not match " +
              "its stored suite meta — refusing to mix evidence across suite versions")
          val (g, s, i) = probe(pinned, bench, cents, tau, maxHamming)
          val srcCol = lit(s"d$day").as("src")
          writeEvidence(dir, "gram", name, g.select(col("doc_id"), col("p"), srcCol))
          writeEvidence(dir, "sem", name,
            s.select(col("doc_id"), col("eval_doc"), col("sim"), srcCol))
          writeEvidence(dir, "img", name,
            i.select(col("doc_id"), col("eval_doc"), col("hamming"), srcCol))
        }
        val t = pinned.txt.select(col("doc_id")).withColumn("in_txt", lit(true))
        val e = pinned.emb.select(col("vec_id").as("doc_id"))
          .withColumn("in_emb", lit(true))
        val i = pinned.img.select(col("media_id").as("doc_id"))
          .withColumn("in_img", lit(true))
        t.join(e, Seq("doc_id"), "full_outer")
          .join(i, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            coalesce(col("in_txt"), lit(false)).as("in_txt"),
            coalesce(col("in_emb"), lit(false)).as("in_emb"),
            coalesce(col("in_img"), lit(false)).as("in_img"))
          .write.parquet(s"$dir/base/day=$day")
        // Day meta LAST — the commit point. Digests are taken over the
        // PINNED batch via the whole-relation aggregate — the same
        // evaluation the evidence derived from (the WinnowStore tear
        // argument); the per-file cache would re-read disk behind the
        // pin (ADVICE r17).
        writeMetaRow(spark, dir, s"$dir/day_meta/day=$day", digestsPinned(pinned))
      } finally {
        pinned.txt.unpersist(blocking = false): Unit
        pinned.emb.unpersist(blocking = false): Unit
        pinned.img.unpersist(blocking = false): Unit
      }
    }
  }

  /** Drop one ingest day (takedown/expiry): day meta FIRST (inverse
    * commit order — a crash mid-retire leaves orphan evidence no
    * longer covered by the composed digest → stale → inline), then the
    * day's base and its `src=d<day>` evidence under EVERY benchmark
    * (including evidence a later [[advanceBenchmark]] history probe
    * attributed back to this day — the per-day split exists exactly so
    * this retire is total). */
  def retireDay(spark: SparkSession, dir: String, day: Int): Unit =
      lockFor(dir).synchronized {
    StoreLease.checkWrite(spark, dir)
    val f = fs(spark, dir)
    f.delete(new Path(s"$dir/day_meta/day=$day"), true): Unit
    f.delete(new Path(s"$dir/base/day=$day"), true): Unit
    Seq("ev_gram", "ev_sem", "ev_img").foreach { eye =>
      val root = new Path(s"$dir/$eye")
      if (f.exists(root))
        f.listStatus(root).filter(_.getPath.getName.startsWith("bench="))
          .foreach(b => f.delete(new Path(b.getPath, s"src=d$day"), true): Unit)
    }
  }

  // ------------------------------------------------- suite advance

  /** Add (or replace) ONE benchmark: retire it, probe the FULL stored
    * history against this benchmark alone — the one corpus sweep a
    * suite advance costs, corpus × delta instead of corpus × suite —
    * and commit its suite meta LAST. `history` must be exactly the
    * corpus the live day metas compose to (digest-checked LOUD: a
    * partial history would write a benchmark whose evidence silently
    * misses docs). The probe's evidence is split back into the
    * `src=d<day>` partitions its docs arrived in, so later day
    * retires/re-advances stay exact. */
  def advanceBenchmark(name: String, bench: Corpus, history: Corpus,
      dir: String): Unit = lockFor(dir).synchronized {
    requireSafeBenchName(name)
    val spark = bench.txt.sparkSession
    StoreLease.checkWrite(spark, dir)
    retireBenchmark(name, spark, dir)
    val cents = storedCodebook(spark, dir)
    val (tau, maxHamming) = storedParams(spark, dir)
    graft.core.Caches.scoped {
      val pinned = Corpus(history.txt.persist(), history.emb.persist(),
        history.img.persist())
      // The benchmark is pinned too (eval-suite-sized): its suite meta
      // commits a digest, and that digest must describe the snapshot
      // the probe's evidence derived from — both read one pin.
      val pinnedBench = Corpus(bench.txt.persist(), bench.emb.persist(),
        bench.img.persist())
      try {
        val dayRows = readMetas(spark, s"$dir/day_meta", "day")
        val composed = composeDigests(dayRows.map(_._2))
        require(composed == digestsPinned(pinned),
          s"verdict store $dir: offered history does not match the live day metas — " +
            "a benchmark advanced over partial history would silently miss docs")
        val liveDays = dayRows.map(_._1)
        val base = spark.read.parquet(s"$dir/base")
          .where(col("day").isin(liveDays: _*))
        val (g, s, i) = probe(pinned, pinnedBench, cents, tau, maxHamming)
        def attributed(ev: DataFrame, flag: String): DataFrame =
          ev.join(base.where(col(flag)).select(col("doc_id"), col("day")), "doc_id")
            .withColumn("src", concat(lit("d"), col("day"))).drop("day")
        writeEvidence(dir, "gram", name, attributed(g, "in_txt"))
        writeEvidence(dir, "sem", name, attributed(s, "in_emb"))
        writeEvidence(dir, "img", name, attributed(i, "in_img"))
        writeMetaRow(spark, dir, s"$dir/suite_meta/bench=$name",
          digestsPinned(pinnedBench))
      } finally {
        Seq(pinned, pinnedBench).foreach { c =>
          c.txt.unpersist(blocking = false): Unit
          c.emb.unpersist(blocking = false): Unit
          c.img.unpersist(blocking = false): Unit
        }
      }
    }
  }

  /** Drop ONE benchmark (deprecation/takedown): suite meta FIRST, then
    * its evidence partitions. ZERO probes — the remaining benchmarks'
    * evidence re-rolls up at serve time, so every doc flagged only by
    * the retired benchmark reads clean again, exactly as if the
    * benchmark had never been in the suite. */
  def retireBenchmark(name: String, spark: SparkSession, dir: String): Unit =
      lockFor(dir).synchronized {
    StoreLease.checkWrite(spark, dir)
    val f = fs(spark, dir)
    f.delete(new Path(s"$dir/suite_meta/bench=$name"), true): Unit
    Seq("ev_gram", "ev_sem", "ev_img").foreach(eye =>
      f.delete(new Path(s"$dir/$eye/bench=$name"), true): Unit)
  }

  // ------------------------------------------------------- serve

  private type Dg = ((Long, Long), (Long, Long), (Long, Long))

  /** Meta partitions under `root` as (partition value, per-eye
    * digests) — bench names for suite_meta, day ints (as strings) for
    * day_meta. Bounded: one row per benchmark/day.
    *
    * ONE partitioned read per meta root (VERDICT r16 next-1), not one
    * `spark.read.parquet(p).head()` per partition: the per-partition
    * form cost O(B + D) SERIAL driver plan-executions per serve —
    * ~1050 at the store's own 50-benchmark × 1000-day design point,
    * the same bottleneck class the evidence path shed in 7e4338a. The
    * explicit schema (partition column included, declared StringType
    * so day=-1 and bench names come back as raw strings) skips footer
    * inference, so the whole call is one listing + one collect of a
    * B- or D-row result. A torn meta partition (dir without committed
    * files) simply contributes no row — exactly the commit-point
    * semantics: a day/bench without its meta is not live. Partition
    * values are URL-unescaped by discovery, which is identity for
    * legal names ([[requireSafeBenchName]] rejects '%'). */
  private[sources] def readMetas(spark: SparkSession, root: String,
      partCol: String): Seq[(String, Dg)] = {
    if (!fs(spark, root).exists(new Path(root))) return Seq.empty
    val schema = StructType(
      Seq("n_txt", "dg_txt", "n_emb", "dg_emb", "n_img", "dg_img")
        .map(StructField(_, LongType)) :+ StructField(partCol, StringType))
    spark.read.schema(schema).option("basePath", root).parquet(root)
      .collect().map { r =>
        (r.getString(6),
          ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)),
            (r.getLong(4), r.getLong(5))))
      }.toSeq
  }

  private def composeDigests(ds: Seq[Dg]): Dg = {
    def comp(sel: Dg => (Long, Long)) =
      (ds.map(sel(_)._1).sum, ds.map(sel(_)._2).foldLeft(0L)(_ ^ _))
    (comp(_._1), comp(_._2), comp(_._3))
  }

  private def evSchema(eye: String): StructType = eye match {
    case "gram" => StructType(Seq(StructField("doc_id", LongType),
      StructField("p", IntegerType)))
    case "sem" => StructType(Seq(StructField("doc_id", LongType),
      StructField("eval_doc", LongType), StructField("sim", DoubleType)))
    case _ => StructType(Seq(StructField("doc_id", LongType),
      StructField("eval_doc", LongType), StructField("hamming", LongType)))
  }

  /** Union of one eye's evidence across live benchmarks and live days
    * — partition-filtered so a crashed advance's orphan partitions
    * (bench without suite meta, day without day meta) are invisible,
    * the sibling stores' live-meta rule.
    *
    * ONE partition-discovery read of the eye's root with bench/src
    * pruning filters, not an explicit path list: the path-list form
    * cost O(benches × days) SERIAL driver `exists()` RPCs per serve —
    * 150k round-trips at 50 benchmarks × 1000 days, a real object-
    * store bottleneck — where discovery is a single (parallelized)
    * listing and the isin filters prune at the partition level
    * (PlanShapeSpec pins PartitionFilters on the serve plan). The
    * explicit schema carries the partition columns so an
    * all-evidence-empty root reads as the typed empty relation
    * instead of an inference error. */
  private def readEvidence(spark: SparkSession, dir: String, eye: String,
      benches: Seq[String], days: Seq[String]): DataFrame = {
    val dataSchema = evSchema(eye)
    val cols = dataSchema.fields.map(f => col(f.name)).toSeq
    val root = s"$dir/ev_$eye"
    // A missing root is the one legal empty: a fresh store whose
    // evidence is genuinely match-free (nothing contaminated yet)
    // serves all-keep, correctly. Any OTHER read failure propagates
    // loudly — after the freshness digests passed, silently serving
    // empty evidence would under-report contamination.
    if (!fs(spark, dir).exists(new Path(root)))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], dataSchema)
    spark.read
      .schema(StructType(dataSchema.fields ++ Seq(
        StructField("bench", StringType), StructField("src", StringType))))
      .option("basePath", root).parquet(root)
      .where(col("bench").isin(benches: _*) &&
        col("src").isin(days.map(d => s"d$d"): _*))
      .select(cols: _*)
  }

  /** Everything a serve needs, or None when unset/unreadable/stale:
    * (live benches, live days, their composed digests). */
  private def opened(spark: SparkSession): Option[(String, Seq[String], Seq[String], Dg, Dg)] = {
    val dir = spark.conf.get(DirKey, "")
    if (dir.isEmpty) return None
    try {
      val suiteRows = readMetas(spark, s"$dir/suite_meta", "bench")
      val dayRows = readMetas(spark, s"$dir/day_meta", "day")
      if (suiteRows.isEmpty || dayRows.isEmpty) {
        System.err.println(s"[verdictstore] $dir has no live benchmarks/days — recomputing inline")
        None
      } else Some((dir, suiteRows.map(_._1), dayRows.map(_._1),
        composeDigests(suiteRows.map(_._2)), composeDigests(dayRows.map(_._2))))
    } catch {
      case NonFatal(e) =>
        System.err.println(s"[verdictstore] unreadable (${e.getMessage}) — recomputing inline")
        None
    }
  }

  private def baseIds(spark: SparkSession, dir: String, days: Seq[String],
      flag: String): DataFrame =
    spark.read.parquet(s"$dir/base")
      .where(col("day").isin(days.map(_.toInt): _*) && col(flag))
      .select("doc_id")

  private def gramVerdict(spark: SparkSession, dir: String,
      benches: Seq[String], days: Seq[String]): DataFrame =
    graft.streaming.DeconGate.flagFromSpans(
      baseIds(spark, dir, days, "in_txt"),
      graft.operators.SubstringDedup.spansFromPositions(
        readEvidence(spark, dir, "gram", benches, days).distinct()))

  private def semVerdict(spark: SparkSession, dir: String,
      benches: Seq[String], days: Seq[String]): DataFrame =
    graft.streaming.DeconGate.flagSemanticFromMatches(
      baseIds(spark, dir, days, "in_emb"),
      readEvidence(spark, dir, "sem", benches, days))

  /** The stored THREE-EYE verdict relation (q198's shape) IF the store
    * is configured and FRESH for the offered train corpus and suite —
    * every digest one hash scan, zero probes, zero decodes; the
    * rollups run over match-sized evidence. None (a driver-log line,
    * never an error) on key unset, unreadable store, or any digest
    * mismatch — the caller recomputes inline. */
  def openFreshThreeEye(train: Corpus, suite: Corpus,
      tau: Double = graft.operators.SimilarityQueries.SemDeconTau,
      maxHamming: Int = graft.operators.MediaQueries.MaxHamming)
      : Option[DataFrame] = {
    val spark = train.txt.sparkSession
    opened(spark).flatMap { case (dir, benches, days, suiteDg, dayDg) =>
      val trusted = spark.conf.get(TrustKey, "false").toBoolean
      val fresh =
        try
          // Thresholds are part of freshness (review r16 finding 2): a
          // store built at a different τ / hamming radius holds
          // evidence thresholded differently from what the caller's
          // verdict contract promises — digest-fresh data, WRONG
          // verdicts. Never trusted away: params are one driver row.
          storedParams(spark, dir) == ((tau, maxHamming)) &&
            (trusted || (digests(suite) == suiteDg && digests(train) == dayDg))
        catch {
          case NonFatal(e) =>
            System.err.println(s"[verdictstore] $dir freshness scan failed (${e.getMessage}) — recomputing inline")
            false
        }
      if (!fresh) {
        System.err.println(s"[verdictstore] $dir is stale for this corpus/suite — recomputing inline")
        None
      } else Some(graft.streaming.DeconGate.composeThreeEye(
        graft.streaming.DeconGate.composeTwoEye(
          gramVerdict(spark, dir, benches, days),
          semVerdict(spark, dir, benches, days)),
        graft.streaming.DeconGate.flagMediaFromPairs(
          baseIds(spark, dir, days, "in_img"),
          readEvidence(spark, dir, "img", benches, days))))
    }
  }

  /** The stored MEDIA PAIR relation (doc_id, eval_doc, hamming) — the
    * q197 relation itself, because the media eye's evidence one level
    * below the verdict IS the pair relation the coverage (q199) and
    * scrub (q200) reports roll up. Served when the store is fresh for
    * the offered (train hashes, suite hashes) at the stored radius —
    * and ONLY the image modality is compared: the eyes are
    * independent, so a text edit that staled the gram evidence cannot
    * invalidate a media pair (per-modality freshness, the store's
    * decomposition argument applied to reads). With this dispatch the
    * whole media decon report tier costs two 16-byte-row hash scans +
    * an evidence read when maintained — zero decodes, zero band
    * joins. */
  def openFreshMediaPairs(trainImg: DataFrame, suiteImg: DataFrame,
      maxHamming: Int = graft.operators.MediaQueries.MaxHamming)
      : Option[DataFrame] = {
    val spark = trainImg.sparkSession
    opened(spark).flatMap { case (dir, benches, days, suiteDg, dayDg) =>
      val trusted = spark.conf.get(TrustKey, "false").toBoolean
      val fresh =
        try
          storedParams(spark, dir)._2 == maxHamming && (trusted ||
            (MediaHashStore.digestOf(suiteImg) == suiteDg._3 &&
              MediaHashStore.digestOf(trainImg) == dayDg._3))
        catch {
          case NonFatal(e) =>
            System.err.println(s"[verdictstore] $dir freshness scan failed (${e.getMessage}) — recomputing inline")
            false
        }
      if (!fresh) {
        System.err.println(s"[verdictstore] $dir is stale for these media hashes — recomputing inline")
        None
      } else Some(readEvidence(spark, dir, "img", benches, days))
    }
  }

  /** The stored TWO-EYE verdict relation (q196's shape) — the same
    * store serving its gram + semantic evidence only. Freshness
    * compares ONLY the text and embedding digests: a two-eye reader
    * holds no image relations, and the media evidence it ignores
    * cannot change a two-eye verdict. */
  def openFreshTwoEye(trainTxt: DataFrame, trainEmb: DataFrame,
      suiteTxt: DataFrame, suiteEmb: DataFrame,
      tau: Double = graft.operators.SimilarityQueries.SemDeconTau)
      : Option[DataFrame] = {
    val spark = trainTxt.sparkSession
    opened(spark).flatMap { case (dir, benches, days, suiteDg, dayDg) =>
      val trusted = spark.conf.get(TrustKey, "false").toBoolean
      val fresh =
        try
          // τ is part of freshness (the three-eye face's argument); the
          // hamming radius is not compared here — a two-eye reader
          // ignores the media evidence the radius thresholded.
          storedParams(spark, dir)._1 == tau && (trusted ||
          ((SignatureStore.digestOf(suiteTxt), VectorIndexStore.digestOf(suiteEmb)) ==
            ((suiteDg._1, suiteDg._2)) &&
          (SignatureStore.digestOf(trainTxt), VectorIndexStore.digestOf(trainEmb)) ==
            ((dayDg._1, dayDg._2))))
        catch {
          case NonFatal(e) =>
            System.err.println(s"[verdictstore] $dir freshness scan failed (${e.getMessage}) — recomputing inline")
            false
        }
      if (!fresh) {
        System.err.println(s"[verdictstore] $dir is stale for this corpus/suite — recomputing inline")
        None
      } else Some(graft.streaming.DeconGate.composeTwoEye(
        gramVerdict(spark, dir, benches, days),
        semVerdict(spark, dir, benches, days)))
    }
  }
}
