package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Caches

/** The owner lease's fencing contract (VERDICT r16 next-5): the
  * cross-process single-writer rule as mechanism — a second writer
  * fails LOUD at its next commit point, never silently races. */
class StoreLeaseSpec extends SparkSpec {
  import spark.implicits._

  /** Plant a higher epoch file the way a foreign PROCESS would — via
    * the filesystem, not acquire() (which would re-register ownership
    * in THIS JVM's held map). */
  private def foreignAcquire(dir: String, epoch: Long): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(new org.apache.hadoop.fs.Path(
      s"$dir/_lease", f"epoch-$epoch%020d"), false)
    out.write("foreign".getBytes("UTF-8")); out.close()
  }

  test("fencing: a newer owner's acquire makes the old owner's next commit fail loud; lease-less writers are rejected") {
    val dir = tmpDir("lease_basic")
    // unleased store: legacy single-writer-by-convention, writes pass
    StoreLease.checkWrite(spark, dir)

    val e1 = StoreLease.acquire(spark, dir, "maintainer-a")
    StoreLease.checkWrite(spark, dir) // holder at max epoch: fine

    // a foreign process takes the store over with a newer epoch: this
    // (old) owner's next commit-point check fails LOUD
    foreignAcquire(dir, e1 + 1)
    val fenced = intercept[IllegalArgumentException] {
      StoreLease.checkWrite(spark, dir)
    }
    assert(fenced.getMessage.contains("FENCED"))

    // a fresh process holding NO lease must not write a leased store
    StoreLease.forgetForTest(dir)
    val unleased = intercept[IllegalArgumentException] {
      StoreLease.checkWrite(spark, dir)
    }
    assert(unleased.getMessage.contains("lease-owned"))

    // the documented takeover: acquire wins a strictly newer epoch and
    // writes flow again in the new owner's process
    val e2 = StoreLease.acquire(spark, dir, "maintainer-b")
    assert(e2 > e1 + 1, "a takeover must win a strictly newer epoch")
    StoreLease.checkWrite(spark, dir)

    // clean retirement releases; the store returns to legacy mode only
    // if no other epochs remain (here older files remain ⇒ still leased)
    StoreLease.release(spark, dir)
    intercept[IllegalArgumentException] { StoreLease.checkWrite(spark, dir) }
  }

  test("verdict store wiring: every mutator checks the lease; a fenced maintainer cannot advance, retire or rebuild") {
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def corpus(p: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      VerdictStore.Corpus(
        docs.filter(p(col("doc_id"))).select("doc_id", "text"),
        emb.filter(p(col("vec_id"))).select("vec_id", "embedding"),
        Seq.empty[(Long, Long)].toDF("media_id", "dhash"))
    val train = corpus(_ % 10 =!= 0)
    val suite = Seq("all" -> corpus(_ % 10 === 0))

    val dir = tmpDir("lease_verdict")
    StoreLease.acquire(spark, dir, "owner-1")
    VerdictStore.build(train, suite, dir, trained = false)
    Caches.releaseAll()
    assert(new java.io.File(s"$dir/_lease").exists(),
      "build must preserve the owner lease while replacing content")

    // a foreign owner fences this JVM
    val cur = new java.io.File(s"$dir/_lease").listFiles()
      .map(_.getName).filter(_.startsWith("epoch-"))
      .map(_.drop(6).toLong).max
    foreignAcquire(dir, cur + 1)

    intercept[IllegalArgumentException] {
      VerdictStore.advanceDay(train, suite, dir, day = 5)
    }
    intercept[IllegalArgumentException] {
      VerdictStore.retireBenchmark("all", spark, dir)
    }
    intercept[IllegalArgumentException] {
      VerdictStore.retireDay(spark, dir, -1)
    }
    intercept[IllegalArgumentException] {
      VerdictStore.build(train, suite, dir, trained = false)
    }
    // the fenced writer's serve-side READS stay valid (committed metas
    // only) — freshness is unaffected by who owns the pen
    spark.conf.set(VerdictStore.DirKey, dir)
    try assert(VerdictStore.openFreshTwoEye(
      train.txt, train.emb, suite.head._2.txt, suite.head._2.emb).isDefined)
    finally spark.conf.unset(VerdictStore.DirKey)
    Caches.releaseAll()
    StoreLease.forgetForTest(dir)
  }

  test("the whole store family is fenced: a sibling store's build/advance/retire check the lease too") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(50)
    val dir = tmpDir("lease_sibling")
    StoreLease.acquire(spark, dir, "owner-sig")
    SignatureStore.build(docs, dir, day = 0)
    assert(new java.io.File(s"$dir/_lease").exists(),
      "a sibling build must preserve the owner lease while replacing content")
    val cur = new java.io.File(s"$dir/_lease").listFiles()
      .map(_.getName).filter(_.startsWith("epoch-"))
      .map(_.drop(6).toLong).max
    foreignAcquire(dir, cur + 1)
    intercept[IllegalArgumentException] {
      SignatureStore.advanceDay(docs, dir, day = 1)
    }
    intercept[IllegalArgumentException] {
      SignatureStore.retireDay(spark, dir, 0)
    }
    intercept[IllegalArgumentException] {
      SignatureStore.build(docs, dir, day = 0)
    }
    Caches.releaseAll()
    StoreLease.forgetForTest(dir)
  }

  test("acquire fails loud on filesystems without atomic exclusive create (r18: object-store honesty)") {
    // S3's connectors implement create(overwrite=false) as
    // check-then-PUT, so two racing acquirers could BOTH win an epoch
    // — the one filesystem assumption the fencing protocol stands on.
    def probeMustNotRun: Boolean =
      fail("an atomic-create scheme (or a refused opt-in) must never pay the capability probe")
    val e = intercept[IllegalArgumentException] {
      StoreLease.requireAtomicCreate("s3a", allowNonAtomic = false, probeMustNotRun)
    }
    assert(e.getMessage.contains("atomic"))
    intercept[IllegalArgumentException] {
      StoreLease.requireAtomicCreate("s3", allowNonAtomic = false, probeMustNotRun)
    }
    // atomic-create filesystems pass without even probing
    StoreLease.requireAtomicCreate("file", allowNonAtomic = false, probeMustNotRun)
    StoreLease.requireAtomicCreate("hdfs", allowNonAtomic = false, probeMustNotRun)
    // and the real acquire path runs the guard: local fs still works
    val dir = tmpDir("lease_atomic")
    assert(StoreLease.acquire(spark, dir) == 1L)
    StoreLease.release(spark, dir)
  }

  test("the non-atomic opt-in is only honored when the connector reports conditional-create (r19)") {
    // Opt-in WITHOUT the capability: the operator's conf says
    // If-None-Match is available but the connector itself doesn't
    // report fs.s3a.create.conditional — exclusive create would still
    // be check-then-PUT, so acquire must refuse rather than trust the
    // word over the probe (VERDICT r18 next-5).
    val e = intercept[IllegalArgumentException] {
      StoreLease.requireAtomicCreate("s3a", allowNonAtomic = true,
        conditionalCreate = false)
    }
    assert(e.getMessage.contains(StoreLease.ConditionalCreateCapability))
    // Opt-in WITH the capability: the conditional-write deployment is
    // accepted — If-None-Match restores atomic exclusive create.
    StoreLease.requireAtomicCreate("s3a", allowNonAtomic = true,
      conditionalCreate = true)
    StoreLease.requireAtomicCreate("s3", allowNonAtomic = true,
      conditionalCreate = true)
  }

  test("replaceContents re-checks the lease after its delete (commit-point narrowing, ADVICE r17)") {
    // A builder fenced DURING replaceContents' delete pass must fail
    // before writing replacement content over the new owner's store.
    val dir = tmpDir("lease_replace")
    val e1 = StoreLease.acquire(spark, dir, "builder-a")
    StoreLease.replaceContents(spark, dir) // owner at max epoch: passes
    foreignAcquire(dir, e1 + 1)
    val fenced = intercept[IllegalArgumentException] {
      StoreLease.replaceContents(spark, dir)
    }
    assert(fenced.getMessage.contains("FENCED"))
    StoreLease.forgetForTest(dir)
  }

  test("a malformed epoch file name reads as not-an-epoch instead of crashing every check") {
    val dir = tmpDir("lease_malformed")
    val e1 = StoreLease.acquire(spark, dir, "owner")
    // a manual touch / torn upload under _lease must not
    // NumberFormatException every subsequent maxEpoch listing
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val junk = fs.create(new org.apache.hadoop.fs.Path(s"$dir/_lease", "epoch-garbage"), false)
    junk.write("x".getBytes("UTF-8")); junk.close()
    StoreLease.checkWrite(spark, dir) // still the holder, still passes
    assert(StoreLease.acquire(spark, dir) == e1 + 1)
    StoreLease.release(spark, dir)
    StoreLease.forgetForTest(dir)
  }
}
