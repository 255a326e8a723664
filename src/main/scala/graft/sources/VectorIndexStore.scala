package graft.sources

import scala.util.control.NonFatal

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Day-partitioned store for the IVF vector index — the
  * [[SignatureStore]]/[[WinnowStore]] maintenance contract applied to
  * the similarity tier, the last heavy-artifact tier that still
  * rebuilt its index per run. q139's daily probe reads a bucket-
  * assigned corpus (n_id, n_vec, bkt); before this store that index
  * was re-derived from the embeddings every run — the corpus-
  * proportional rescan the incremental path exists to avoid, and
  * exactly what Faiss-style deployments persist.
  *
  * Layout under one root:
  * {{{
  *   <dir>/codebook/      (c_id, cv)               written ONCE at build
  *   <dir>/assign/day=N/  (n_id, n_vec, bkt)       bucket assignments
  *   <dir>/meta/          (day, n_vecs, digest)    one row per day
  * }}}
  *
  * **The codebook is a FROZEN model artifact.** [[advanceDay]] assigns
  * its batch against the STORED codebook (K driver rows, never
  * re-derived) — that is what makes the index incremental: day N+1's
  * assignments are valid next to day ≤ N's because both used the same
  * quantizer, the standard IVF operational contract (retraining the
  * quantizer = a new index = [[build]]).
  *
  * Freshness covers BOTH halves: per-day digests over the indexed
  * vectors `(count, XOR of xxhash64(vec_id, embedding))` XOR-compose
  * on read and must match the offered index relation; and the stored
  * codebook must equal the codebook the offered corpus implies (a K-row
  * driver comparison — both sides are the same deterministic
  * derivation, so equality is exact, not approximate). A stale store
  * costs an inline re-assignment, never a wrong neighbor.
  */
object VectorIndexStore {

  /** Session conf: root dir of the store. Unset (default) = no store. */
  val DirKey = "spark.graft.vectorstore.dir"

  /** Session conf: skip BOTH freshness checks and trust the store. */
  val TrustKey = "spark.graft.vectorstore.trust"

  /** Whether the last [[buildPqScaled]] reused the artifact pass's
    * codes (`corpus eq indexRel`) instead of re-encoding the index
    * relation — observability for the one-build-one-encode contract
    * (VERDICT r15 next-4); result rows are identical either way. */
  private[graft] val lastPqBuildReusedCodes =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  /** The meta rows (day, n, digest) and their composed (Σn, XOR)
    * digest — collected to the driver (one row per day, bounded).
    * Open faces read ONLY `day=` partitions named here: a crashed
    * advance (partition written, meta row not) leaves an orphan day
    * the digest no longer covers, and reading the whole directory
    * would silently serve those extra rows past a digest check made
    * against the pre-advance meta (ADVICE r13 — the
    * SemanticDeconStore live-meta orphan rule, applied to all three
    * faces here). */
  private def liveMeta(spark: SparkSession,
      metaPath: String): (Seq[(Int, Long, Long)], (Long, Long)) = {
    val rows = spark.read.parquet(metaPath).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // Zero-row days hold no data and XOR a zero digest — skip them so
    // a day whose empty write produced no partition dir stays readable.
    (rows.filter(_._2 > 0L),
      (rows.map(_._2).sum, rows.map(_._3).foldLeft(0L)(_ ^ _)))
  }

  /** Corpus digest over an embedding relation (vec_id, embedding) —
    * the [[SignatureStore.digestOf]] shape for the vector tier.
    * xxhash64 hashes the float array exactly, so the digest is
    * bit-stable across partitionings and parquet roundtrips. */
  def digestOf(e: DataFrame): (Long, Long) =
    FileDigests.digestOf(e, xxhash64(col("vec_id"), col("embedding")))

  /** Write-path variant: whole-relation aggregate over `e` as
    * evaluated (honors a pinned batch), never the per-file cache —
    * [[FileDigests.digestOfPinned]]'s tear argument (ADVICE r17). */
  def digestOfPinned(e: DataFrame): (Long, Long) =
    FileDigests.digestOfPinned(e, xxhash64(col("vec_id"), col("embedding")))

  private def writeDay(spark: SparkSession, dir: String, day: Int,
      batch: DataFrame, cents: Seq[(Long, Seq[Double])], mode: String): Unit = {
    // Pinned across assignment write + digest (the WinnowStore.writeDay
    // argument): a non-deterministic batch plan must not persist a
    // digest that doesn't cover the assigned rows.
    val pinned = batch.persist()
    try {
      graft.operators.SimilarityQueries.ivfAssign(pinned, cents)
        .withColumn("day", lit(day))
        .write.mode(mode).partitionBy("day").parquet(s"$dir/assign")
      // Meta lands LAST — the commit point.
      StoreLease.checkWrite(spark, dir) // commit-point re-check (ADVICE r17)
      val (n, dg) = digestOfPinned(pinned)
      spark.createDataFrame(Seq((day, n, dg))).toDF("day", "n_vecs", "digest")
        .coalesce(1).write.mode(mode).parquet(s"$dir/meta")
    } finally pinned.unpersist(blocking = false): Unit
  }

  /** Build a fresh index at `dir`: train (collect) the codebook from
    * `corpus`, assign `indexRel` as `day`. Replaces prior content. */
  def build(corpus: DataFrame, indexRel: DataFrame, dir: String,
      day: Int = 0): Unit = {
    val spark = corpus.sparkSession
    StoreLease.checkWrite(spark, dir)
    StoreLease.replaceContents(spark, dir)
    val cents = graft.operators.SimilarityQueries.centroidList(corpus)
    spark.createDataFrame(cents).toDF("c_id", "cv")
      .coalesce(1).write.parquet(s"$dir/codebook")
    writeDay(spark, dir, day, indexRel, cents, "errorifexists")
  }

  /** The stored codebook — K driver rows. */
  def storedCodebook(spark: SparkSession, dir: String): Seq[(Long, Seq[Double])] =
    spark.read.parquet(s"$dir/codebook")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq

  /** Append one ingest day: assign ONLY the batch against the STORED
    * codebook (never re-derived — the frozen-quantizer contract), XOR
    * its digest into the meta. Idempotent per day (existing `day=N`
    * content is retired first), so at-least-once replay converges. */
  def advanceDay(batch: DataFrame, dir: String, day: Int): Unit = {
    val spark = batch.sparkSession
    val cents = storedCodebook(spark, dir)
    retireDay(spark, dir, day)
    writeDay(spark, dir, day, batch, cents, "append")
  }

  /** Retire one day (takedown/expiry): drop its partition, XOR its
    * digest back out of the meta. The codebook stays — it is a model
    * artifact, not data derived from the retired day. */
  def retireDay(spark: SparkSession, dir: String, day: Int): Unit = {
    StoreLease.checkWrite(spark, dir)
    val f = fs(spark, dir)
    f.delete(new Path(s"$dir/assign/day=$day"), true): Unit
    f.delete(new Path(s"$dir/codes/day=$day"), true): Unit
    if (!f.exists(new Path(s"$dir/meta"))) return
    val kept = spark.read.parquet(s"$dir/meta")
      .where(col("day") =!= day).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    StoreLease.checkWrite(spark, dir) // commit-point re-check (ADVICE r17)
    spark.createDataFrame(kept).toDF("day", "n_vecs", "digest")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  // ------------------------------------------------------ PQ face
  /** Build the COMPRESSED index (IVF-PQ): coarse codebook + per-
    * subspace PQ codebooks (both frozen model artifacts, driver rows)
    * + the coded corpus (vec_id, bkt, sub, code) as `day`. This is
    * the artifact whose derivation is expensive at production shapes
    * (a k-means training pass + a full encode per run); q82/q88 read
    * it instead when configured and fresh. */
  def buildPq(corpus: DataFrame, dir: String, day: Int = 0): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    StoreLease.checkWrite(spark, dir)
    StoreLease.replaceContents(spark, dir)
    val pinned = corpus.persist()
    try {
      val (coarse, cents, codes) =
        graft.operators.SimilarityQueries.pqIndexArtifacts(pinned)
      spark.createDataFrame(coarse).toDF("c_id", "cv")
        .coalesce(1).write.parquet(s"$dir/codebook")
      cents.toSeq.flatMap { case (sub, cs) =>
        cs.map { case (cid, cv) => (sub, cid, cv) }
      }.toDF("sub", "cid", "cv")
        .coalesce(1).write.parquet(s"$dir/pq_codebook")
      codes.withColumn("day", lit(day))
        .write.partitionBy("day").parquet(s"$dir/codes")
      StoreLease.checkWrite(spark, dir) // commit-point re-check (ADVICE r17)
      val (n, dg) = digestOfPinned(pinned)
      spark.createDataFrame(Seq((day, n, dg))).toDF("day", "n_vecs", "digest")
        .coalesce(1).write.parquet(s"$dir/meta")
    } finally pinned.unpersist(blocking = false): Unit
  }

  /** The stored PQ codebooks — m × k' driver rows. */
  def storedPqCodebook(spark: SparkSession, dir: String)
      : Map[Int, Seq[(Long, Seq[Double])]] =
    storedPqCodebookAt(spark, s"$dir/pq_codebook")

  /** Append one day of PQ codes, encoded against BOTH frozen
    * codebooks. Idempotent per day (retire-then-rewrite). */
  def advanceDayPq(batch: DataFrame, dir: String, day: Int): Unit = {
    val spark = batch.sparkSession
    val coarse = storedCodebook(spark, dir)
    val cents = storedPqCodebook(spark, dir)
    retireDay(spark, dir, day)
    val pinned = batch.persist()
    try {
      graft.operators.SimilarityQueries.pqEncodeWith(pinned, coarse, cents)
        .withColumn("day", lit(day))
        .write.mode("append").partitionBy("day").parquet(s"$dir/codes")
      StoreLease.checkWrite(spark, dir) // commit-point re-check (ADVICE r17)
      val (n, dg) = digestOfPinned(pinned)
      spark.createDataFrame(Seq((day, n, dg))).toDF("day", "n_vecs", "digest")
        .coalesce(1).write.mode("append").parquet(s"$dir/meta")
    } finally pinned.unpersist(blocking = false): Unit
  }

  /** The stored (coarse codebook, PQ codebooks, codes) IF configured
    * and the day digests compose to this exact corpus — None on key
    * unset, unreadable store, coarse-codebook drift, or digest
    * mismatch. Same freshness contract as [[openFresh]]: the digest
    * covers every input row of the deterministic derivation, so a
    * match means retraining would reproduce the stored artifacts. */
  def openFreshPq(corpus: DataFrame)
      : Option[(Seq[(Long, Seq[Double])], Map[Int, Seq[(Long, Seq[Double])]], DataFrame)] = {
    val spark = corpus.sparkSession
    val dir = spark.conf.get(DirKey, "")
    if (dir.isEmpty) return None
    try {
      val coarse = storedCodebook(spark, dir)
      val trusted = spark.conf.get(TrustKey, "false").toBoolean
      if (!trusted &&
        graft.operators.SimilarityQueries.centroidList(corpus) != coarse) {
        System.err.println(s"[vectorstore] $dir codebook differs from this corpus's — deriving inline")
        return None
      }
      val (days, stored) = liveMeta(spark, s"$dir/meta")
      if (!trusted && digestOf(corpus) != stored) {
        System.err.println(s"[vectorstore] $dir is stale for this corpus — deriving inline")
        None
      } else if (days.isEmpty) {
        Some((coarse, storedPqCodebook(spark, dir),
          spark.range(0).select(col("id").as("vec_id"), col("id").as("bkt"),
            col("id").cast("int").as("sub"), col("id").as("code"))))
      } else Some((coarse, storedPqCodebook(spark, dir),
        spark.read.parquet(days.map(d => s"$dir/codes/day=${d._1}"): _*)
          .select("vec_id", "bkt", "sub", "code")))
    } catch {
      case NonFatal(e) =>
        System.err.println(s"[vectorstore] $dir unreadable (${e.getMessage}) — deriving inline")
        None
    }
  }

  // ------------------------------------------- scaled-K face (r13)
  /** Build the DATA-SCALED index face: the q188 shape — a FROZEN
    * unit-normalized codebook at the Faiss K = ⌈√N⌉ sizing plus the
    * (vec_id, nv, bkt) assignments as `day`. This is the face where
    * the store's economics flip POSITIVE on this very fixture (unlike
    * the K=16 base face, whose honest negative SCALE.md documents):
    * at K = √N the assignment is K dots per vector — the dominant,
    * corpus-sided term of every probe — and the digest-verify scan it
    * pays instead is one hash per vector. Lives beside the base/PQ
    * faces under the same [[DirKey]] (own subpaths + meta).
    *
    * `trained` defaults TRUE (r16, VERDICT r15 next-2): a production
    * build runs the spherical k-means job — on a clustered corpus
    * whose low ids share a cluster, first-K leaves other clusters
    * centroid-less and the candidate join under-recalls
    * (TrainedCodebookSpec plants that corpus and pins the repair).
    * First-K remains the EXPLICIT fixture/oracle convention: parity
    * specs pass `trained = false` because the inline arm they pin
    * against derives first-K, and byte-parity across two separately
    * trained builds would additionally hang on float-sum order. */
  def buildScaled(corpus: DataFrame, indexRel: DataFrame, dir: String,
      day: Int = 0, trained: Boolean = true): Unit = {
    val spark = corpus.sparkSession
    val f = fs(spark, dir)
    f.delete(new Path(s"$dir/codebook_scaled"), true): Unit
    f.delete(new Path(s"$dir/codebook_meta_scaled"), true): Unit
    f.delete(new Path(s"$dir/assign_scaled"), true): Unit
    f.delete(new Path(s"$dir/meta_scaled"), true): Unit
    // Pinned: the codebook meta's digest must cover exactly the rows
    // the codebook was derived from.
    val pinned = corpus.persist()
    try {
      val k = graft.operators.SimilarityQueries.scaledK(pinned)
      val cents =
        if (trained)
          graft.operators.SimilarityQueries.scaledCodebookTrained(pinned, k)
        else graft.operators.SimilarityQueries.scaledCodebook(pinned, k)
      spark.createDataFrame(cents.zipWithIndex.map { case (cv, i) => (i.toLong, cv) })
        .toDF("c_id", "cv")
        .coalesce(1).write.parquet(s"$dir/codebook_scaled")
      // Codebook freshness artifact: (corpus count, corpus digest,
      // trained?) — [[openFreshScaled]] verifies the OFFERED corpus
      // digests to this instead of re-deriving the codebook, which for
      // a trained codebook would mean re-running the training job on
      // every open (and for first-K was a collect of the same cost
      // class anyway). A grown/mutated corpus digests differently →
      // stale → the Faiss retrain event, same contract as before.
      StoreLease.checkWrite(spark, dir) // commit-point re-check (ADVICE r17)
      val (n, dg) = digestOfPinned(pinned)
      spark.createDataFrame(Seq((n, dg, trained)))
        .toDF("n_vecs", "digest", "trained")
        .coalesce(1).write.parquet(s"$dir/codebook_meta_scaled")
      writeDayScaled(spark, dir, day, indexRel, cents, "errorifexists")
    } finally pinned.unpersist(blocking = false): Unit
  }

  /** The stored scaled codebook — ⌈√N⌉ driver rows, index-ordered. */
  def storedScaledCodebook(spark: SparkSession, dir: String): Seq[Seq[Double]] =
    spark.read.parquet(s"$dir/codebook_scaled")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).map(_._2).toSeq

  private def writeDayScaled(spark: SparkSession, dir: String, day: Int,
      batch: DataFrame, cents: Seq[Seq[Double]], mode: String): Unit = {
    val pinned = batch.persist()
    try {
      graft.operators.SimilarityQueries.scaledAssign(pinned, cents)
        .withColumn("day", lit(day))
        .write.mode(mode).partitionBy("day").parquet(s"$dir/assign_scaled")
      StoreLease.checkWrite(spark, dir) // commit-point re-check (ADVICE r17)
      val (n, dg) = digestOfPinned(pinned)
      spark.createDataFrame(Seq((day, n, dg))).toDF("day", "n_vecs", "digest")
        .coalesce(1).write.mode(mode).parquet(s"$dir/meta_scaled")
    } finally pinned.unpersist(blocking = false): Unit
  }

  /** Append one day against the FROZEN scaled codebook (the same
    * frozen-quantizer contract as [[advanceDay]] — note K froze at
    * build-time corpus size; a corpus that outgrows its √N codebook
    * re-[[buildScaled]]s, the Faiss retrain event). Idempotent. */
  def advanceDayScaled(batch: DataFrame, dir: String, day: Int): Unit = {
    val spark = batch.sparkSession
    val cents = storedScaledCodebook(spark, dir)
    retireDayScaled(spark, dir, day)
    writeDayScaled(spark, dir, day, batch, cents, "append")
  }

  /** Retire one scaled-face day: partition drop + XOR-heal. */
  def retireDayScaled(spark: SparkSession, dir: String, day: Int): Unit = {
    StoreLease.checkWrite(spark, dir)
    val f = fs(spark, dir)
    f.delete(new Path(s"$dir/assign_scaled/day=$day"), true): Unit
    if (!f.exists(new Path(s"$dir/meta_scaled"))) return
    val kept = spark.read.parquet(s"$dir/meta_scaled")
      .where(col("day") =!= day).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    StoreLease.checkWrite(spark, dir) // commit-point re-check (ADVICE r17)
    spark.createDataFrame(kept).toDF("day", "n_vecs", "digest")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta_scaled")
  }

  /** The stored (scaled codebook, assignments) IF configured and fresh
    * for this exact (corpus, index) pair — the [[openFresh]] contract
    * for the scaled face: the stored codebook must equal the one the
    * offered corpus implies at ITS √N sizing (so a grown corpus reads
    * stale, forcing the retrain), and the index digest must compose. */
  def openFreshScaled(corpus: DataFrame, idxRel: DataFrame)
      : Option[(Seq[Seq[Double]], DataFrame)] = {
    val spark = corpus.sparkSession
    val dir = spark.conf.get(DirKey, "")
    if (dir.isEmpty) return None
    try {
      val cents = storedScaledCodebook(spark, dir)
      val trusted = spark.conf.get(TrustKey, "false").toBoolean
      // Codebook freshness: the build-time corpus digest (one hash pass
      // over the offered corpus) — re-deriving the codebook would mean
      // re-running the k-means job for a trained store. Pre-meta stores
      // (no codebook_meta_scaled) fall back to the first-K comparison.
      // Evaluated ONLY when untrusted (TrustKey skips both scans —
      // review r14 finding 2: an eager digestOf here was exactly the
      // per-open corpus pass the trust lever exists to avoid).
      val cbFresh = trusted || {
        if (fs(spark, dir).exists(new Path(s"$dir/codebook_meta_scaled"))) {
          val m = spark.read.parquet(s"$dir/codebook_meta_scaled").head()
          (m.getLong(0), m.getLong(1)) == digestOf(corpus)
        } else graft.operators.SimilarityQueries.scaledCodebook(
          corpus, graft.operators.SimilarityQueries.scaledK(corpus)) == cents
      }
      if (!cbFresh) {
        System.err.println(s"[vectorstore] $dir scaled codebook differs from this corpus's — assigning inline")
        return None
      }
      val (days, stored) = liveMeta(spark, s"$dir/meta_scaled")
      if (!trusted && digestOf(idxRel) != stored) {
        System.err.println(s"[vectorstore] $dir scaled face is stale for this index — assigning inline")
        None
      } else if (days.isEmpty) {
        Some((cents, spark.range(0).select(col("id").as("vec_id"),
          array().cast("array<double>").as("nv"), col("id").as("bkt"))))
      } else Some((cents,
        spark.read.parquet(days.map(d => s"$dir/assign_scaled/day=${d._1}"): _*)
          .select("vec_id", "nv", "bkt")))
    } catch {
      case NonFatal(e) =>
        System.err.println(s"[vectorstore] $dir scaled face unreadable (${e.getMessage}) — assigning inline")
        None
    }
  }

  // --------------------------------------- scaled-K PQ face (r14)
  /** Build the DATA-SCALED compressed index — the q195 serving shape:
    * K=⌈√N⌉ coarse codebook (`trained = true` runs the spherical
    * k-means job instead of first-K), per-subspace PQ codebooks, and
    * the coded corpus, all under the same [[DirKey]] root (own
    * subpaths + metas). This face is where the store's economics are
    * strongest: it amortizes the N·√N coarse assignment AND the PQ
    * train + encode — everything q195 pays except the probe itself
    * (the xpk bench pair prices the split). Freshness is the scaled
    * face's: a build-time corpus digest for the codebooks (one hash
    * pass on open — no retraining to verify a trained codebook) plus
    * XOR-composed day digests for the codes.
    *
    * When `corpus eq indexRel` (the common self-indexing build: Bench
    * xpk, q195's specs) the artifacts' codes ARE the index codes and
    * the build runs ONE assignment + subvector explode; value-equal
    * but DISTINCT plans still re-encode because nothing ties their
    * row sets together until the digests (ADVICE r14). Every in-repo
    * caller now threads the same reference;
    * [[lastPqBuildReusedCodes]] makes the dispatch spec-pinnable
    * (VERDICT r15 next-4's one-build-one-encode).
    *
    * `trained` defaults TRUE (r16 — [[buildScaled]]'s argument; the
    * r15 xpk serve-invariance pair measured that the probe cost is
    * codebook-provenance-independent, so the default costs the serve
    * path nothing and buys the recall). First-K stays the explicit
    * fixture/oracle convention at parity call sites. */
  def buildPqScaled(corpus: DataFrame, indexRel: DataFrame, dir: String,
      day: Int = 0, trained: Boolean = true): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val f = fs(spark, dir)
    Seq("codebook_pqs", "pq_codebook_pqs", "codes_pqs", "meta_pqs",
      "codebook_meta_pqs")
      .foreach(p => f.delete(new Path(s"$dir/$p"), true): Unit)
    // The common build indexes the codebook corpus itself (Bench xpk,
    // q195's specs) — in that case the artifacts' codes ARE the index
    // codes, and re-encoding pinnedI would run the N·√N coarse
    // assignment + subvector explode a second time over a distinct
    // persisted plan (ADVICE r14). Reference equality is the honest
    // test: value-equal but distinct plans still need their own encode
    // because nothing ties their row sets together until the digests.
    val same = corpus eq indexRel
    val pinnedC = corpus.persist()
    val pinnedI = if (same) pinnedC else indexRel.persist()
    try {
      val sq = graft.operators.SimilarityQueries
      val k = sq.scaledK(pinnedC)
      val cents =
        if (trained) sq.scaledCodebookTrained(pinnedC, k)
        else sq.scaledCodebook(pinnedC, k)
      spark.createDataFrame(cents.zipWithIndex.map { case (cv, i) => (i.toLong, cv) })
        .toDF("c_id", "cv")
        .coalesce(1).write.parquet(s"$dir/codebook_pqs")
      // Codebooks (coarse AND PQ) train on the CORPUS — the model
      // artifacts advance-days stay valid against (the buildScaled
      // two-relation contract: the codebook source is keyed separately
      // from the indexed data, so daily advances/retires of the code
      // set never read stale just because the code set changed —
      // review r14 finding 1).
      val (_, pqCents, corpusCodes) = sq.pqScaledIndexArtifactsWith(pinnedC, cents)
      pqCents.toSeq.flatMap { case (sub, cs) =>
        cs.map { case (cid, cv) => (sub, cid, cv) }
      }.toDF("sub", "cid", "cv")
        .coalesce(1).write.parquet(s"$dir/pq_codebook_pqs")
      val codes =
        if (same) corpusCodes
        else sq.pqEncodeScaledWith(pinnedI, cents, pqCents)
      lastPqBuildReusedCodes.set(same)
      codes.withColumn("day", lit(day))
        .write.partitionBy("day").parquet(s"$dir/codes_pqs")
      StoreLease.checkWrite(spark, dir) // commit-point re-check (ADVICE r17)
      val (cn, cdg) = digestOfPinned(pinnedC)
      spark.createDataFrame(Seq((cn, cdg, trained)))
        .toDF("n_vecs", "digest", "trained")
        .coalesce(1).write.parquet(s"$dir/codebook_meta_pqs")
      val (n, dg) = digestOfPinned(pinnedI)
      spark.createDataFrame(Seq((day, n, dg))).toDF("day", "n_vecs", "digest")
        .coalesce(1).write.parquet(s"$dir/meta_pqs")
    } finally {
      pinnedC.unpersist(blocking = false): Unit
      if (!same) pinnedI.unpersist(blocking = false): Unit
    }
  }

  /** The stored scaled coarse codebook — ⌈√N⌉ driver rows. */
  def storedPqScaledCodebook(spark: SparkSession, dir: String): Seq[Seq[Double]] =
    spark.read.parquet(s"$dir/codebook_pqs")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).map(_._2).toSeq

  /** Append one day of scaled PQ codes, encoded against BOTH frozen
    * codebooks. Idempotent per day (unconditional retire-then-write). */
  def advanceDayPqScaled(batch: DataFrame, dir: String, day: Int): Unit = {
    val spark = batch.sparkSession
    val cents = storedPqScaledCodebook(spark, dir)
    val pqCents = storedPqCodebookAt(spark, s"$dir/pq_codebook_pqs")
    retireDayPqScaled(spark, dir, day)
    val pinned = batch.persist()
    try {
      graft.operators.SimilarityQueries
        .pqEncodeScaledWith(pinned, cents, pqCents)
        .withColumn("day", lit(day))
        .write.mode("append").partitionBy("day").parquet(s"$dir/codes_pqs")
      StoreLease.checkWrite(spark, dir) // commit-point re-check (ADVICE r17)
      val (n, dg) = digestOfPinned(pinned)
      spark.createDataFrame(Seq((day, n, dg))).toDF("day", "n_vecs", "digest")
        .coalesce(1).write.mode("append").parquet(s"$dir/meta_pqs")
    } finally pinned.unpersist(blocking = false): Unit
  }

  /** Retire one scaled-PQ day: partition drop + XOR-heal (safe on a
    * torn store — no meta ⇒ partition drop only). */
  def retireDayPqScaled(spark: SparkSession, dir: String, day: Int): Unit = {
    StoreLease.checkWrite(spark, dir)
    val f = fs(spark, dir)
    f.delete(new Path(s"$dir/codes_pqs/day=$day"), true): Unit
    if (!f.exists(new Path(s"$dir/meta_pqs"))) return
    val kept = spark.read.parquet(s"$dir/meta_pqs")
      .where(col("day") =!= day).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    StoreLease.checkWrite(spark, dir) // commit-point re-check (ADVICE r17)
    spark.createDataFrame(kept).toDF("day", "n_vecs", "digest")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta_pqs")
  }

  /** The stored (scaled codebook, PQ codebooks, codes) IF configured
    * and fresh for this exact (codebook corpus, indexed data) pair —
    * the [[openFreshScaled]] two-relation contract: the build-time
    * codebook digest must equal the OFFERED codebook corpus's (so a
    * grown/mutated training corpus forces the Faiss retrain event,
    * with no retraining needed to check), and the XOR-composed day
    * digests must equal the offered INDEX relation's (so daily
    * advances and takedowns stay servable — the codes changing is
    * maintenance, not staleness). Only live-meta day partitions are
    * read. */
  def openFreshPqScaled(corpus: DataFrame, idxRel: DataFrame)
      : Option[(Seq[Seq[Double]], Map[Int, Seq[(Long, Seq[Double])]], DataFrame)] = {
    val spark = corpus.sparkSession
    val dir = spark.conf.get(DirKey, "")
    if (dir.isEmpty) return None
    try {
      val cents = storedPqScaledCodebook(spark, dir)
      val trusted = spark.conf.get(TrustKey, "false").toBoolean
      if (!trusted) {
        val cb = spark.read.parquet(s"$dir/codebook_meta_pqs").head()
        if ((cb.getLong(0), cb.getLong(1)) != digestOf(corpus)) {
          System.err.println(s"[vectorstore] $dir scaled-PQ codebook predates this corpus — deriving inline")
          return None
        }
      }
      val (days, stored) = liveMeta(spark, s"$dir/meta_pqs")
      if (!trusted && digestOf(idxRel) != stored) {
        System.err.println(s"[vectorstore] $dir scaled-PQ codes are stale for this index — deriving inline")
        None
      } else if (days.isEmpty) {
        Some((cents, storedPqCodebookAt(spark, s"$dir/pq_codebook_pqs"),
          spark.range(0).select(col("id").as("vec_id"), col("id").as("bkt"),
            col("id").cast("int").as("sub"), col("id").as("code"))))
      } else Some((cents, storedPqCodebookAt(spark, s"$dir/pq_codebook_pqs"),
        spark.read.parquet(days.map(d => s"$dir/codes_pqs/day=${d._1}"): _*)
          .select("vec_id", "bkt", "sub", "code")))
    } catch {
      case NonFatal(e) =>
        System.err.println(s"[vectorstore] $dir scaled-PQ face unreadable (${e.getMessage}) — deriving inline")
        None
    }
  }

  private def storedPqCodebookAt(spark: SparkSession, path: String)
      : Map[Int, Seq[(Long, Seq[Double])]] =
    spark.read.parquet(path)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
      .groupBy(_._1).map { case (sub, rs) =>
        sub -> rs.sortBy(_._2).map(t => (t._2, t._3)).toSeq
      }

  /** The stored (codebook, assignments) IF configured and fresh for
    * this exact (corpus, index) pair — None (driver-log line, never an
    * error) on key unset, unreadable store, stored-vs-implied codebook
    * mismatch, or index digest mismatch. */
  def openFresh(corpus: DataFrame, idxRel: DataFrame)
      : Option[(Seq[(Long, Seq[Double])], DataFrame)] = {
    val spark = corpus.sparkSession
    val dir = spark.conf.get(DirKey, "")
    if (dir.isEmpty) return None
    try {
      val cents = storedCodebook(spark, dir)
      val trusted = spark.conf.get(TrustKey, "false").toBoolean
      if (!trusted &&
        graft.operators.SimilarityQueries.centroidList(corpus) != cents) {
        System.err.println(s"[vectorstore] $dir codebook differs from this corpus's — assigning inline")
        return None
      }
      val (days, stored) = liveMeta(spark, s"$dir/meta")
      if (!trusted && digestOf(idxRel) != stored) {
        System.err.println(s"[vectorstore] $dir is stale for this index — assigning inline")
        None
      } else if (days.isEmpty) {
        // zero live days: the index is legitimately empty (empty
        // assign/ has no schema to infer — serve the typed relation)
        Some((cents, spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          idxRel.select(col("vec_id").as("n_id"),
            col("embedding").as("n_vec"), lit(0L).as("bkt")).schema)))
      } else Some((cents,
        spark.read.parquet(days.map(d => s"$dir/assign/day=${d._1}"): _*)
          .select("n_id", "n_vec", "bkt")))
    } catch {
      case NonFatal(e) =>
        System.err.println(s"[vectorstore] $dir unreadable (${e.getMessage}) — assigning inline")
        None
    }
  }
}
