package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The per-file digest cache's contract (VERDICT r16 next-2):
  *
  *  - byte-equality with the whole-relation aggregate on every plan
  *    shape the stores digest (bare scan, partition filter, data
  *    filter, projection) — the fast path must be provably exact, not
  *    approximately fresh;
  *  - steady state serves from the cache with ZERO Spark jobs (one
  *    listing, no data) — the flat-serve property the verdict store's
  *    100 TB freshness check rides on;
  *  - churn costs exactly the changed files: an appended day scans its
  *    own files only, a retired day composes scan-free, a rewritten
  *    file re-scans and changes the digest;
  *  - everything else (in-memory fixtures, nondeterministic plans)
  *    falls back to the whole-relation aggregate.
  */
class FileDigestsSpec extends SparkSpec {
  import spark.implicits._

  private val hashCol: Column = xxhash64(col("doc_id"), col("text"))

  /** The pre-r17 whole-relation aggregate — the semantics oracle. */
  private def rawDigest(df: DataFrame): (Long, Long) = {
    val r = df.agg(
      count(lit(1)).as("n"),
      coalesce(call_function("bit_xor", hashCol), lit(0L)).as("dg")).head()
    (r.getLong(0), r.getLong(1))
  }

  private def writeDay(root: String, day: Int, ids: Range, tag: String = ""): Unit =
    ids.map(i => (i.toLong, s"doc $i body$tag", day))
      .toDF("doc_id", "text", "day")
      .repartition(2)
      .write.mode("append").partitionBy("day").parquet(root)

  private def corpus(root: String): DataFrame = spark.read.parquet(root)

  test("per-file digest is byte-equal to the whole-relation aggregate on every store plan shape") {
    FileDigests.clearForTest()
    val root = tmpDir("filedigests_eq")
    writeDay(root, 1, 0 until 40)
    writeDay(root, 2, 40 until 90)

    val shapes: Seq[DataFrame] = Seq(
      corpus(root),                                        // bare scan
      corpus(root).where(col("day") === 2),                // partition filter
      corpus(root).where(col("doc_id") % 3 =!= 0),         // data filter
      corpus(root).where(col("day") === 1 && col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("text")),               // both + projection
      corpus(root).withColumn("text", upper(col("text"))), // computed column
      // Widened reads (graft.core.Par.widen, r19): the Repartition is
      // layout-only, so it must neither demote the digest to a
      // whole-relation scan nor change its value or cache keys.
      graft.core.Par.widen(corpus(root)),                  // widened scan
      graft.core.Par.widen(corpus(root))
        .where(col("doc_id") % 3 =!= 0),                   // widened + filter
      corpus(root).repartition(col("day")),                // keyed repartition
    )
    shapes.foreach { df =>
      assert(FileDigests.digestOf(df, hashCol) == rawDigest(df),
        s"fast path must equal the aggregate for plan:\n${df.queryExecution.logical}")
    }
    // every shape above took the per-file path, never the fallback
    assert(FileDigests.fullScans.sum() == 0,
      "file-backed deterministic plans must all decompose")
    // A widened read shares the unwidened read's partials: digesting
    // the widened shape again after the cache is warm scans nothing.
    val scanned0 = FileDigests.filesScanned.sum()
    FileDigests.digestOf(graft.core.Par.widen(corpus(root)), hashCol)
    assert(FileDigests.filesScanned.sum() == scanned0,
      "a repartitioned read must hit the same per-file cache entries")
  }

  test("steady state composes from cache with zero jobs; churn scans exactly the changed files") {
    FileDigests.clearForTest()
    val root = tmpDir("filedigests_churn")
    writeDay(root, 1, 0 until 30)
    writeDay(root, 2, 30 until 60)

    val first = FileDigests.digestOf(corpus(root), hashCol)
    val primed = FileDigests.filesScanned.sum()
    assert(primed > 0, "the first digest must prime the per-file cache")

    // steady state, inferred-schema read: no DATA scanned (the one job
    // a fresh spark.read.parquet costs is schema inference — an O(1)
    // footer read, not a corpus pass)
    val inferJobs = countJobs {
      assert(FileDigests.digestOf(corpus(root), hashCol) == first)
    }
    assert(inferJobs <= 1 && FileDigests.filesScanned.sum() == primed,
      "an unchanged corpus must compose from cache, zero files scanned")
    assert(FileDigests.composedServes.sum() == 1)

    // steady state, explicit-schema read (the deployed store shape):
    // strictly ZERO jobs — one driver-side listing, nothing else
    val schema = corpus(root).schema
    val served = countJobs {
      assert(FileDigests.digestOf(
        spark.read.schema(schema).parquet(root), hashCol) == first)
    }
    assert(served == 0,
      s"an unchanged explicit-schema corpus must digest with zero jobs (got $served)")

    // append a day: only ITS files scan (the listing includes them as
    // uncached; everything prior composes from cache)
    writeDay(root, 3, 60 until 100)
    val day3Files = new java.io.File(s"$root/day=3").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(day3Files > 0)
    val before = FileDigests.filesScanned.sum()
    assert(FileDigests.digestOf(corpus(root), hashCol) == rawDigest(corpus(root)),
      "the appended corpus must digest exactly")
    assert(FileDigests.filesScanned.sum() - before == day3Files,
      "an appended day must scan exactly its own files")

    // retire a day: compose scan-free from the surviving files' cache
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/day=2"), true)
    val afterRetire = FileDigests.filesScanned.sum()
    val survivorsRaw = rawDigest(corpus(root))
    val retired = countJobs {
      assert(FileDigests.digestOf(
        spark.read.schema(schema).parquet(root), hashCol) == survivorsRaw,
        "a retired day must leave the composition exactly")
    }
    assert(FileDigests.filesScanned.sum() == afterRetire && retired == 0,
      "a retire must not scan anything — the dropped files just leave the composition")

    // rewrite a day (new part files): re-scan, digest changes and is exact
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/day=1"), true)
    writeDay(root, 1, 0 until 30, tag = " EDITED")
    val mutated = FileDigests.digestOf(corpus(root), hashCol)
    assert(mutated == rawDigest(corpus(root)), "a mutated day must digest exactly")
    assert(mutated != first, "the digest must see the mutation")
  }

  test("persisted partials survive a process restart: a COLD session composes with zero files scanned (r18)") {
    FileDigests.clearForTest()
    val root = tmpDir("filedigests_persist")
    val side = tmpDir("filedigests_sidecar")
    writeDay(root, 1, 0 until 40)
    writeDay(root, 2, 40 until 80)
    spark.conf.set(FileDigests.DirKey, side)
    try {
      val first = FileDigests.digestOf(corpus(root), hashCol)
      assert(FileDigests.filesScanned.sum() > 0, "the priming digest scans")

      // simulate a fresh JVM: wipe the in-memory cache (and the
      // loaded-dir latch); only the on-disk sidecar survives
      FileDigests.clearForTest()
      val schema = corpus(root).schema
      val jobs = countJobs {
        assert(FileDigests.digestOf(
          spark.read.schema(schema).parquet(root), hashCol) == first)
      }
      assert(FileDigests.filesScanned.sum() == 0,
        "a cold session on an unchanged corpus must compose from the sidecar, zero scans")
      assert(jobs == 0, s"and with zero Spark jobs (got $jobs)")

      // churn in the cold session: exactly the new files scan, and the
      // new partials persist too — the NEXT cold session is again scan-free
      writeDay(root, 3, 80 until 100)
      assert(FileDigests.digestOf(corpus(root), hashCol) == rawDigest(corpus(root)))
      assert(FileDigests.filesScanned.sum() > 0)
      FileDigests.clearForTest()
      assert(FileDigests.digestOf(
        spark.read.schema(schema).parquet(root), hashCol) == rawDigest(corpus(root)))
      assert(FileDigests.filesScanned.sum() == 0,
        "churn-scanned partials must persist for the next session")
    } finally spark.conf.unset(FileDigests.DirKey)
  }

  test("partials a FOREIGN process persists after this JVM's first load compose on the next miss, zero files scanned (r19)") {
    FileDigests.clearForTest()
    val root = tmpDir("filedigests_foreign")
    val side = tmpDir("filedigests_foreign_side")
    writeDay(root, 1, 0 until 40)
    writeDay(root, 2, 40 until 80)
    spark.conf.set(FileDigests.DirKey, side)
    try {
      // "maintainer process": scans the corpus and persists every partial
      val first = FileDigests.digestOf(corpus(root), hashCol)
      assert(FileDigests.filesScanned.sum() > 0)

      // "serve process": its first sidecar load happened BEFORE those
      // appends (dir latched as loaded, nothing cached, nothing
      // consumed) — the r18 load-once latch would re-scan the corpus
      // here; the r19 miss-path re-list must compose instead
      FileDigests.simulateStaleProcessForTest(side)
      val before = FileDigests.filesScanned.sum()
      val schema = corpus(root).schema
      val jobs = countJobs {
        assert(FileDigests.digestOf(
          spark.read.schema(schema).parquet(root), hashCol) == first)
      }
      assert(FileDigests.filesScanned.sum() == before,
        "the server must compose the maintainer's persisted partials, zero files scanned")
      assert(jobs == 0, s"and with zero Spark jobs (got $jobs)")

      // churn on top: the re-list finds nothing new for day 3, so
      // exactly its files scan — the miss-path refresh must not mask
      // genuinely new data
      writeDay(root, 3, 80 until 100)
      val day3Files = new java.io.File(s"$root/day=3").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(FileDigests.digestOf(corpus(root), hashCol) == rawDigest(corpus(root)))
      assert(FileDigests.filesScanned.sum() - before == day3Files,
        "an appended day still scans exactly its own files")
    } finally spark.conf.unset(FileDigests.DirKey)
  }

  test("an evicting cache never re-appends records the sidecar already holds (r19: no duplicate-record growth)") {
    FileDigests.clearForTest()
    val root = tmpDir("filedigests_noredup")
    val side = tmpDir("filedigests_noredup_side")
    // 3 days × 2 part-files = 6 (plan, file) partials against a cap of
    // 4: every digest call rescans some files the LRU evicted — the
    // r18 sidecar grew by ~one corpus of duplicate records per call
    writeDay(root, 1, 0 until 20)
    writeDay(root, 2, 20 until 40)
    writeDay(root, 3, 40 until 60)
    spark.conf.set(FileDigests.MaxEntriesKey, "4")
    spark.conf.set(FileDigests.DirKey, side)
    try {
      val expected = rawDigest(corpus(root))
      (1 to 3).foreach { i =>
        assert(FileDigests.digestOf(corpus(root), hashCol) == expected,
          s"pass $i: thrashing must cost scans only, never exactness")
      }
      val fs = new org.apache.hadoop.fs.Path(side)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val bytes = fs.listStatus(new org.apache.hadoop.fs.Path(side))
        .filter(_.getPath.getName.endsWith(".bin")).map(_.getLen).sum
      assert(bytes == 6L * 48,
        s"the sidecar must hold each partial exactly once (got $bytes bytes, want ${6 * 48})")
    } finally {
      spark.conf.unset(FileDigests.MaxEntriesKey)
      spark.conf.unset(FileDigests.DirKey)
    }
  }

  test("digestOfPinned always takes the whole-relation aggregate and honors a persisted snapshot (ADVICE r17)") {
    FileDigests.clearForTest()
    val root = tmpDir("filedigests_pinned")
    writeDay(root, 1, 0 until 20)
    val df = corpus(root)
    assert(FileDigests.digestOfPinned(df, hashCol) == rawDigest(df),
      "the pinned arm computes the same digest on an unchanged relation")
    assert(FileDigests.pinnedScans.sum() == 1)
    assert(FileDigests.filesScanned.sum() == 0,
      "the write path must never populate (or read) the per-file cache")

    // The tear the arm exists to forbid: a maintainer pins a batch,
    // derives evidence from the pin, then digests for the meta — if the
    // corpus mutates in between, the meta digest must describe the
    // PINNED snapshot (what the evidence came from), not the new disk.
    val pinned = corpus(root).persist()
    pinned.count(): Unit // materialize the snapshot
    val before = FileDigests.digestOfPinned(pinned, hashCol)
    // Mutate the way a FOREIGN process would — raw FS rename, not a
    // DataFrameWriter to the same root (whose refreshByPath would
    // helpfully re-cache the pin in THIS JVM and hide the tear).
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val stage = tmpDir("filedigests_pinned_stage")
    writeDay(stage, 1, 0 until 20, tag = " MUTATED")
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/day=1"), true)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$stage/day=1"),
      new org.apache.hadoop.fs.Path(s"$root/day=1")))
    assert(FileDigests.digestOfPinned(pinned, hashCol) == before,
      "the pinned digest reads the snapshot the evidence derived from")
    assert(FileDigests.digestOf(corpus(root), hashCol) != before,
      "while the serve-side digest sees the mutated disk (stale, demote)")
    pinned.unpersist(blocking = true): Unit
  }

  test("an undersized cache cap degrades to rescans, never to a wrong digest (r18 cap policy)") {
    FileDigests.clearForTest()
    val root = tmpDir("filedigests_thrash")
    // 3 days × 2 part-files = 6 (plan, file) partials against a cap of 4:
    // every digest call evicts what an earlier call wrote
    writeDay(root, 1, 0 until 20)
    writeDay(root, 2, 20 until 40)
    writeDay(root, 3, 40 until 60)
    spark.conf.set(FileDigests.MaxEntriesKey, "4")
    try {
      val expected = rawDigest(corpus(root))
      (1 to 3).foreach { i =>
        assert(FileDigests.digestOf(corpus(root), hashCol) == expected,
          s"pass $i: thrashing must cost scans only, never exactness")
      }
      assert(FileDigests.filesScanned.sum() > 6,
        "an undersized cap visibly rescans (the thrash warning's trigger)")
    } finally spark.conf.unset(FileDigests.MaxEntriesKey)
  }

  test("sidecar compaction folds an accumulation of append files into one, losing nothing (r18)") {
    FileDigests.clearForTest()
    val root = tmpDir("filedigests_compact")
    val side = tmpDir("filedigests_compact_side")
    writeDay(root, 1, 0 until 30)
    spark.conf.set(FileDigests.DirKey, side)
    try {
      // prime + persist the real corpus partials
      val first = FileDigests.digestOf(corpus(root), hashCol)
      // then simulate a long deployment history: many tiny append files
      // (foreign keys — compaction must carry them, not judge them)
      val fs = new org.apache.hadoop.fs.Path(side)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val junk = 70
      (1 to junk).foreach { i =>
        val p = new org.apache.hadoop.fs.Path(side, f"digests-junk-$i%03d.bin")
        val out = new java.io.DataOutputStream(fs.create(p, false))
        out.write(f"$i%032d".getBytes("US-ASCII")) // 32-char pseudo-key
        out.writeLong(i.toLong); out.writeLong(i.toLong)
        out.close()
        // age past the compaction grace window (a fresh file could be a
        // concurrent session's open append and is deliberately spared)
        fs.setTimes(p, System.currentTimeMillis() - 11L * 60 * 1000, -1)
      }
      val countBefore = fs.listStatus(new org.apache.hadoop.fs.Path(side))
        .count(_.getPath.getName.endsWith(".bin"))
      assert(countBefore > 70)

      // a fresh session's load compacts: few files, every record kept
      FileDigests.clearForTest()
      val schema = corpus(root).schema
      assert(FileDigests.digestOf(
        spark.read.schema(schema).parquet(root), hashCol) == first)
      assert(FileDigests.filesScanned.sum() == 0,
        "compaction must not lose the real partials — still zero scans")
      val after = fs.listStatus(new org.apache.hadoop.fs.Path(side))
        .filter(_.getPath.getName.endsWith(".bin"))
      assert(after.length < countBefore && after.length <= 2,
        s"the load must rewrite ${countBefore} append files into one (got ${after.length})")
      assert(after.map(_.getLen).sum >= junk.toLong * 48,
        "every record — including foreign keys — survives the rewrite")

      // and the compacted sidecar still serves the NEXT cold session
      FileDigests.clearForTest()
      assert(FileDigests.digestOf(
        spark.read.schema(schema).parquet(root), hashCol) == first)
      assert(FileDigests.filesScanned.sum() == 0)
    } finally spark.conf.unset(FileDigests.DirKey)
  }

  test("concurrent digests into one sidecar stay exact and reload exactly (r19)") {
    // Two threads digest two different relations (distinct plan
    // signatures) against ONE configured sidecar dir, repeatedly and
    // concurrently — the documented worst cases are duplicate records
    // (deduped on load) and rescans, NEVER a wrong digest. Assertions
    // are exactness-only; no counter assertions (schedules vary).
    FileDigests.clearForTest()
    val root = tmpDir("filedigests_conc")
    val side = tmpDir("filedigests_conc_side")
    writeDay(root, 1, 0 until 40)
    writeDay(root, 2, 40 until 80)
    spark.conf.set(FileDigests.DirKey, side)
    try {
      val relA = () => corpus(root).where(col("day") === 1)
      val relB = () => corpus(root).where(col("day") === 2)
      val wantA = rawDigest(relA())
      val wantB = rawDigest(relB())
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = Seq(
        (relA, wantA), (relB, wantB), (relA, wantA), (relB, wantB)
      ).map { case (rel, want) =>
        new Thread(() =>
          try (1 to 3).foreach { i =>
            val got = FileDigests.digestOf(rel(), hashCol)
            assert(got == want, s"pass $i: concurrent digest must stay exact")
          } catch { case t: Throwable => errs.add(t): Unit })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errs.isEmpty, s"concurrent digests failed: ${Option(errs.peek()).map(_.getMessage)}")

      // a cold session over whatever record set the race persisted
      // still composes both relations exactly, zero files scanned
      FileDigests.clearForTest()
      assert(FileDigests.digestOf(relA(), hashCol) == wantA)
      assert(FileDigests.digestOf(relB(), hashCol) == wantB)
      assert(FileDigests.filesScanned.sum() == 0,
        "every partial the race persisted must reload exactly")
    } finally spark.conf.unset(FileDigests.DirKey)
  }

  test("non-file and nondeterministic plans fall back to the whole-relation aggregate") {
    FileDigests.clearForTest()
    val mem = (0L until 20L).map(i => (i, s"mem $i")).toDF("doc_id", "text")
    assert(FileDigests.digestOf(mem, hashCol) == rawDigest(mem),
      "an in-memory relation digests through the aggregate arm")
    assert(FileDigests.fullScans.sum() == 1)

    val root = tmpDir("filedigests_nondet")
    writeDay(root, 1, 0 until 10)
    // rand() < 2 keeps every row, but a nondeterministic filter must
    // never be re-evaluated per file behind the plan's back (the
    // pinned-batch tear argument) — fallback, still correct
    val nondet = corpus(root).where(rand() < 2.0)
    assert(FileDigests.digestOf(nondet, hashCol)._1 == 10L)
    assert(FileDigests.fullScans.sum() == 2)
  }
}
