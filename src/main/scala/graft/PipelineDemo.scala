package graft

import java.io.{File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.jobs.{CompactionJob, CompactorJob, RepairJob}
import graft.multimodal.MediaOps
import graft.sources.BronzeReader
import graft.state.JdbcStateStore
import graft.streaming.StreamingIngest

/** End-to-end usage demo of the pipeline layer — the flow the reference
  * runs in production (SURVEY §3.1–3.3), driven through the public API:
  *
  *   register bronze keys → claim → bronze→silver compaction → ack →
  *   idempotent re-run → small-file compaction → mispartition repair →
  *   streaming (AvailableNow) ingest → multimodal feature extraction.
  *
  * Run: `sbt "runMain graft.PipelineDemo /tmp/graft_demo"`
  */
object PipelineDemo {

  private val Base = 1704067200L // 2024-01-01T00:00:00Z

  private def writeGz(path: String, lines: Seq[String]): String = {
    val f = new File(path)
    f.getParentFile.mkdirs()
    val out = new GZIPOutputStream(new FileOutputStream(f))
    out.write(lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    out.close()
    f.toURI.toString
  }

  private def telemetry(hb: Long, unit: String, speed: Double, extra: String = ""): String =
    s"""{"heartbeat": $hb, "unitno": "$unit", "deviceid": "DEV-$unit", "gpsspeed": $speed, "VehicleSpeed": ${speed - 1.0}, "gpsnumsat": 11.0, "gpslat": -2.1, "gpslong": 115.4, "speedsource": "GPS", "camcabinstatus": "OK", "camfrontstatus": "OK"$extra}"""

  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/graft_demo")
    new scala.reflect.io.Directory(new File(root)).deleteRecursively()
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // -- 1. bronze fixtures: mixed epoch precisions, drift, corruption, late row
    val keys = Seq(
      writeGz(s"$root/bronze/site/dev1/2024010100/2024010100.txt.gz", Seq(
        telemetry(Base, "LD772", 42.5), // seconds epoch
        telemetry((Base + 60) * 1000, "LD772", 43.0), // ms
        telemetry((Base + 120) * 1000000L, "LD772", 44.0), // µs
        telemetry((Base + 180) * 1000000000L, "LD772", 45.0))), // ns
      writeGz(s"$root/bronze/site/dev2/2024010100/2024010100.txt.gz", Seq(
        telemetry(Base + 240, "PM1582", 30.0, """, "fuel_level": 0.82"""), // drifted schema
        """{"heartbeat": 999, BROKEN""", // malformed line
        telemetry(Base - 86400, "PM1582", 31.0)))) // late: lands in yesterday's partition

    // -- 2. claim → compact → ack (file-level exactly-once)
    val store = new JdbcStateStore(s"jdbc:derby:memory:demo;create=true")
    store.ensureTable()
    keys.zipWithIndex.foreach { case (k, i) =>
      store.register(k, "DISTRICTB", new Timestamp(1704067200000L + i))
    }
    val silver = s"$root/silver"
    val r1 = CompactorJob.run(spark, store, "run-1", "DISTRICTB", silver)
    println(s"[demo] run-1: claimed=${r1.claimed} rows=${r1.rows} quarantined=${r1.quarantined}")

    val layout = spark.read.parquet(silver)
      .groupBy("hiveperiod", "dstrct_code").count()
      .orderBy("hiveperiod").collect()
      .map(r => s"${r.get(0)}/${r.getString(1)}=${r.getLong(2)}").mkString(" ")
    println(s"[demo] silver partitions: $layout")

    // -- 2b. the control table is itself a queryable relation
    //        (SURVEY S3: spark.read.jdbc over the state store)
    val control = spark.read.format("jdbc")
      .option("url", "jdbc:derby:memory:demo")
      .option("dbtable", store.Table)
      .load()
    val stateCounts = control.groupBy("compression_status").count()
      .collect().map(r => s"${Option(r.getString(0)).getOrElse("NULL")}=${r.getLong(1)}")
      .sorted.mkString(" ")
    println(s"[demo] control table via spark.read.jdbc: $stateCounts")

    // -- 3. idempotent re-run: nothing left to claim
    val r2 = CompactorJob.run(spark, store, "run-2", "DISTRICTB", silver)
    println(s"[demo] run-2 (re-run): claimed=${r2.claimed} rows=${r2.rows}")

    // -- 4. fragment a partition with hourly appends, then compact
    (1 to 6).foreach { h =>
      val k = writeGz(s"$root/bronze/site/dev1/202401010$h/202401010$h.txt.gz",
        Seq(telemetry(Base + h * 3600, "LD772", 40.0 + h)))
      store.register(k, "DISTRICTB", new Timestamp(1704067200000L + 1000 + h))
      CompactorJob.run(spark, store, s"run-h$h", "DISTRICTB", silver)
    }
    val frag = CompactionJob.findFragmented(spark, silver, maxFiles = 2)
    val cr = CompactionJob.run(spark, silver, maxFiles = 2)
    println(s"[demo] compaction: fragmented=${frag.map(p => s"${p.relPath}(${p.files}f)").mkString(",")} " +
      s"rows ${cr.rowsBefore}->${cr.rowsAfter} verified=${cr.verified}")

    // -- 4b. layout-fixing rewrite: the same data z-ordered on two
    //        filter dimensions, so footer min/max prune either predicate
    val zdemo = s"$root/silver_z"
    val zsrc = spark.read.parquet(silver)
      .where(col("heartbeat").isNotNull && col("gpsspeed").isNotNull)
    graft.sources.ClusteredWriter.writeZOrdered(
      zsrc, col("heartbeat"), col("gpsspeed"), zdemo, 4)
    val zspan = graft.sources.ClusteredWriter.auditLayout(
      spark.read.parquet(zdemo), col("heartbeat"), col("gpsspeed"))
      .agg(round(avg(greatest(col("x_span"), col("y_span"))), 3)).collect()(0)
    println(s"[demo] z-ordered rewrite: files=4 mean_worst_span=${zspan.get(0)}")

    // -- 5. legacy mispartitioned data → repair
    import spark.implicits._
    Seq((Base + 2 * 86400, "LEGACY", "2024-01-01", "DISTRICTB"))
      .toDF("heartbeat", "unitno", "hiveperiod", "dstrct_code")
      .withColumn("hiveperiod", col("hiveperiod").cast("date"))
      .write.mode("append").partitionBy("hiveperiod", "dstrct_code").parquet(silver)
    val moved = RepairJob.repair(spark, silver)
    val total = spark.read.parquet(silver).count()
    println(s"[demo] repair: moved=$moved rows_total=$total " +
      s"mispartitioned_now=${RepairJob.detectMispartitioned(spark.read.parquet(silver)).count()}")

    // -- 6. streaming flavor: AvailableNow drain of a fresh bronze dir
    val sbronze = s"$root/bronze2"
    writeGz(s"$sbronze/site/dev9/2024010200/2024010200.txt.gz",
      Seq(telemetry(Base + 86400, "ST1", 55.0), telemetry(Base + 86460, "ST1", 56.0)))
    val schema = BronzeReader.withCorruptColumn(
      spark.read.option("samplingRatio", "1.0").json(s"$sbronze/site/*/*").schema)
    val q = StreamingIngest.start(spark, s"$sbronze/site/*/*", schema,
      s"$root/silver_stream", s"$root/ckpt", "DISTRICTG")
    q.awaitTermination(120000)
    println(s"[demo] streaming silver rows=${spark.read.parquet(s"$root/silver_stream").count()}")

    // -- 6b. the dashboard read path over the silver lake
    val silverDf = spark.read.parquet(silver)
    val units = graft.analytics.Dashboard.unitList(silverDf, "2024-01-01", "DISTRICTB")
      .select("unitno").collect().map(_.getString(0)).sorted
    val slice = graft.analytics.Dashboard.telemetrySlice(
      silverDf, "2024-01-01", "DISTRICTB", units.toSeq, (0, 23))
    val perMin = graft.analytics.Dashboard.perMinuteDeviation(slice)
    println(s"[demo] dashboard: units=${units.mkString(",")} minutes=${perMin.count()}")

    // -- 6c. typed top-k: best readings per unit via the bounded-buffer
    //        Aggregator (no full window sort)
    val topSpeeds = silverDf
      .where(col("gpsspeed").isNotNull && col("gpsspeed") > 0)
      .select(col("unitno"), struct(col("gpsspeed"), col("heartbeat")).as("p"))
      .as[(String, (Double, Long))]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new graft.functions.TopKAggregator(2).toColumn.name("topk"))
      .collect()
      .map { case (u, xs) => s"$u=[${xs.map(_._1).mkString(",")}]" }.sorted.mkString(" ")
    println(s"[demo] top-2 speeds per unit: $topSpeeds")

    // -- 7. day-over-day dedup maintenance: the carried bloom index —
    //       each day sketches only its own batch and ORs it in; the
    //       whole history travels as the bitmap, never as re-read files
    val day1 = Seq((1L, "alpha bravo charlie"), (2L, "delta echo foxtrot"))
      .toDF("doc_id", "text")
    val (_, _, idx1) = graft.operators.DedupQueries.bloomAdvanceDay(
      day1, xxhash64(col("text")), None, 1000L)
    val day2 = Seq((3L, "alpha bravo charlie"), (4L, "golf hotel india"))
      .toDF("doc_id", "text")
    val (dNew, dMaybe, idx2) = graft.operators.DedupQueries.bloomAdvanceDay(
      day2, xxhash64(col("text")), Some(idx1), 1000L)
    println(s"[demo] bloom day-2: definitely_new=${dNew.count()} " +
      s"maybe_seen=${dMaybe.count()} carried_index_bytes=${idx2.length}")

    // -- 8. multimodal plumbing — one REAL PNG (decoded by the JDK
    //       imageio leg: true dims + pixel features) next to a
    //       stub-path blob and a video
    val img = new java.awt.image.BufferedImage(12, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 12)
      img.setRGB(x, y, if (x < 6) 0x000000 else 0xFFFFFF)
    val pngBuf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", pngBuf)
    val media = Seq(
      MediaOps.MediaRow(1L, "image", Array.tabulate(64)(_.toByte), 8, 8, 0L),
      MediaOps.MediaRow(2L, "video", Array.tabulate(900)(_.toByte), 640, 480, 3000L),
      MediaOps.MediaRow(3L, "image", pngBuf.toByteArray, 0, 0, 0L)).toDS()
    val feats = MediaOps.extractFeatures(media).collect()
    val frames = MediaOps.sampleFrames(media, 1000L).count()
    val dims = MediaOps.withDecodedDims(media).collect()
      .map(r => s"${r.media_id}:${r.width}x${r.height}").sorted.mkString(",")
    println(s"[demo] media: features=${feats.map(f => s"${f.media_id}:${f.features.length}d").mkString(",")} " +
      s"frames=$frames decoded_dims=$dims")

    // -- 9. feed-health monitoring: a (dow, hour) baseline from history
    //       and the silent-slot watchdog paging for the busy hour the
    //       CURRENT day never emitted (the zero-count case no windowed
    //       count can produce a row for)
    val histTs = (1 to 3).flatMap { w =>
      Seq.fill(5 + w)(new Timestamp((Base - 7L * 86400 * w + 9 * 3600) * 1000))
    }.map(t => ("telemetry", t))
    val volBase = graft.streaming.VolumeMonitor.baseline(
      histTs.toDF("event_type", "ts"))
    val silent = graft.streaming.VolumeMonitor.silentSlots(
      Seq.empty[(Timestamp, String)].toDF("window_start", "event_type"),
      volBase, new Timestamp(Base * 1000), new Timestamp((Base + 43200) * 1000))
      .collect()
    println(s"[demo] silent-slot watchdog: " +
      silent.map(r => s"${r.getString(2)}@${r.getTimestamp(0)} z=${r.getDouble(6)}").mkString(","))

    // -- 10. selection tier, train-batch/serve-stream: fit the q128 LR
    //        quality classifier on a labeled reference corpus, ship the
    //        17-double weight vector into a stateless gate, and filter
    //        an unlabeled batch with it (the same column gates a
    //        readStream — zero state, zero shuffle)
    val labeled = Seq(
      (1L, "the device reported a clean heartbeat trace", "en"),
      (2L, "the unit logged a stable speed profile", "en"),
      (3L, "el dispositivo reporta un error critico", "es"),
      (4L, "la unidad perdio la senal del gps", "es"))
      .toDF("doc_id", "text", "lang")
    val weights = graft.operators.ClassifierQueries.trainWeights(labeled)
    val gated = graft.streaming.QualityGate.gate(Seq(
      (10L, "the heartbeat trace looks clean and stable"),
      (11L, "la senal reporta un error del gps"))
      .toDF("doc_id", "text"), weights)
      .collect().map(r => s"${r.getLong(0)}:keep=${r.getBoolean(3)}")
    println(s"[demo] quality gate: ${gated.mkString(",")}")

    // -- 11. governance tier: leakage-safe split (near-dup docs share a
    //        split BY CONSTRUCTION via their cluster id), the
    //        temperature-rebalanced source mix, and rendezvous-stable
    //        output sharding (drop a shard → only its keys move)
    val corpus = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf", "webA"),
      (2L, "alpha bravo charlie delta echo foxtrot golf", "webA"), // near-dup of 1
      (3L, "hotel india juliet kilo lima mike november", "webA"),
      (4L, "oscar papa quebec romeo sierra tango uniform", "webB"))
      .toDF("doc_id", "text", "source")
    val split = graft.operators.DedupQueries.clusterSplitOn(corpus)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    graft.core.Caches.releaseAll()
    require(split(1L) == split(2L), "near-dups must share a split")
    println(s"[demo] cluster split: ${split.toSeq.sortBy(_._1)
      .map { case (d, s) => s"$d=$s" }.mkString(",")} (1 and 2 co-assigned)")
    val mix = graft.operators.SamplingQueries.tempMixtureOn(corpus)
      .collect().map(r => s"${r.getString(0)}:boost=${r.getDouble(4)}").sorted
    graft.core.Caches.releaseAll()
    println(s"[demo] temperature mix (tau=0.7): ${mix.mkString(",")}")
    val shards = corpus.select(col("doc_id"),
      graft.operators.LayoutQueries.hrwShard(col("doc_id"), 4).as("s4"),
      graft.operators.LayoutQueries.hrwShard(col("doc_id"), 3).as("s3"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    require(shards.filter(_._2 != 3).forall(t => t._2 == t._3),
      "dropping shard 3 must not move surviving-shard keys")
    println(s"[demo] rendezvous shards 4->3: ${shards.map {
      case (d, a, b) => s"$d:$a->$b" }.mkString(",")}")

    // -- 12. exactly-once streaming output: the claim/ack discipline on
    //        the OUTPUT side — a replayed micro-batch (the at-least-once
    //        case Structured Streaming hands every foreachBatch sink)
    //        skips instead of duplicating
    val sinkOut = s"$root/tx_silver"
    val b0 = Seq((1L, "alpha"), (2L, "bravo")).toDF("id", "text")
    val first = graft.streaming.TransactionalSink.writeBatch(
      b0, store, "demo_silver", sinkOut, batchId = 0L)
    val replay = graft.streaming.TransactionalSink.writeBatch(
      b0, store, "demo_silver", sinkOut, batchId = 0L)
    val committed = spark.read.parquet(sinkOut).count()
    println(s"[demo] transactional sink: first_write=$first replay_skipped=${!replay} rows=$committed")

    // -- 13. ingest-time curation gates (round-12 tier): the Gopher
    //        repetition gate (stateless per-row column) and eval-set
    //        decontamination through a build-once benchmark store —
    //        both verdicts at arrival, not at the next batch sweep
    val passage = ("all rights reserved worldwide under the berne " +
      "convention and no part may be reproduced without permission ") * 2
    val repGated = graft.streaming.RepetitionGate.gate(Seq(
      (20L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
      (21L, Array.fill(30)("spam spam").mkString(" ")))
      .toDF("doc_id", "text"))
      .collect().map(r => s"${r.getLong(0)}:keep=${r.getAs[Boolean]("keep")}")
    println(s"[demo] repetition gate: ${repGated.mkString(",")}")
    val evalSuite = Seq((90L, passage)).toDF("doc_id", "text")
    val deconDir = s"$root/deconstore"
    graft.sources.DeconStore.build(evalSuite, deconDir)
    graft.core.Caches.releaseAll()
    spark.conf.set(graft.sources.DeconStore.DirKey, deconDir)
    val deconOut = graft.streaming.DeconGate.flag(Seq(
      (30L, "a clean training document with entirely original words"),
      (31L, "leaked prefix " + passage))
      .toDF("doc_id", "text"), evalSuite)
      .collect().map(r => s"${r.getLong(0)}:keep=${r.getBoolean(2)}")
    spark.conf.unset(graft.sources.DeconStore.DirKey)
    graft.core.Caches.releaseAll()
    println(s"[demo] decon gate (store-served): ${deconOut.mkString(",")}")

    // ...and the SEMANTIC decon face (r13): a paraphrased benchmark
    // copy shares no 40-char run — the gram gate above keeps it — but
    // its embedding sits next to the eval doc's, so the embedding gate
    // quarantines it. The two gates compose: keep = gramKeep ∧ semKeep.
    val rnd = new scala.util.Random(5)
    val base = Array.fill(16)(rnd.nextGaussian())
    val semOut = graft.streaming.DeconGate.flagSemantic(
      Seq((40L, base.map(x => (x + 0.01).toFloat).toSeq),            // paraphrase
        (41L, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq))     // clean
        .toDF("vec_id", "embedding"),
      Seq((90L, base.map(_.toFloat).toSeq)).toDF("vec_id", "embedding"),
      tau = 0.9)
      .collect().map(r => s"${r.getLong(0)}:keep=${r.getBoolean(3)}")
    graft.core.Caches.releaseAll()
    println(s"[demo] semantic decon gate: ${semOut.mkString(",")}")

    // ...and the COMPOSED verdict (r14, q196's kernel): one relation,
    // both eyes' evidence, keep = clean under both — doc 50 drops on
    // grams alone, 51 on the embedding alone, 52 keeps.
    val combOut = graft.streaming.DeconGate.flagCombined(
      Seq((50L, "stolen text " + passage),
        (51L, "a fully paraphrased benchmark with no shared runs at all"),
        (52L, "original and clean training content through and through"))
        .toDF("doc_id", "text"),
      evalSuite,
      Seq((50L, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq),
        (51L, base.map(x => (x - 0.01).toFloat).toSeq),
        (52L, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq))
        .toDF("vec_id", "embedding"),
      Seq((90L, base.map(_.toFloat).toSeq)).toDF("vec_id", "embedding"),
      tau = 0.9)
      .collect().sortBy(_.getLong(0))
      .map(r => s"${r.getLong(0)}:keep=${r.getBoolean(4)}")
    graft.core.Caches.releaseAll()
    println(s"[demo] combined decon verdict: ${combOut.mkString(",")}")

    // ...and the THREE-EYE verdict (r15, q198's kernel): doc 60 is
    // clean text + clean embedding, but its IMAGE is the benchmark's
    // own, re-crawled under a rewritten caption — only the media eye
    // (dHash over decoded pixels, hamming 0) sees it; doc 61 has no
    // image and keeps its two-eye verdict (absence of evidence is not
    // contamination).
    val evCaption = "a benchmark photograph of a rare astronomical event"
    val evImg = graft.multimodal.MediaDedup.hashImages(
      Seq((90L, graft.multimodal.MediaDedup.renderImage(evCaption)))
        .toDF("media_id", "content"))
    val threeOut = graft.streaming.DeconGate.flagThreeEye(
      Seq((60L, "original clean words through and through again"),
        (61L, "more original clean words that never leak anything"))
        .toDF("doc_id", "text"),
      evalSuite,
      Seq((60L, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq),
        (61L, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq))
        .toDF("vec_id", "embedding"),
      Seq((90L, base.map(_.toFloat).toSeq)).toDF("vec_id", "embedding"),
      graft.multimodal.MediaDedup.hashImages(
        Seq((60L, graft.multimodal.MediaDedup.renderImage(evCaption)))
          .toDF("media_id", "content")),
      evImg, tau = 0.9)
      .collect().sortBy(_.getLong(0))
      .map(r => s"${r.getLong(0)}:imgHits=${r.getLong(4)},keep=${r.getBoolean(6)}")
    graft.core.Caches.releaseAll()
    println(s"[demo] three-eye decon verdict: ${threeOut.mkString(",")}")

    // -- 14. the ANN serving face's daily maintenance (r15): the
    //        scaled-K IVF store (xsk/xpk's deployed shape) advances by
    //        micro-batch through the maintainer — exactly once, each
    //        batch assigned against the FROZEN √N codebook — so the
    //        serving face is stream-current with no nightly
    //        re-assignment job; a replayed batch skips.
    val embAll = (0 until 64).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val embBackfill = embAll.where(col("vec_id") < 48)
    val embFresh = embAll.where(col("vec_id") >= 48)
    val vdir = s"$root/scaledstore"
    graft.sources.VectorIndexStore.buildScaled(embAll, embBackfill, vdir, day = -1)
    val advanced = graft.streaming.VectorMaintainer.advanceBatchScaled(
      embFresh, store, "demo_scaled", vdir, batchId = 0L)
    val advReplay = graft.streaming.VectorMaintainer.advanceBatchScaled(
      embFresh, store, "demo_scaled", vdir, batchId = 0L)
    spark.conf.set(graft.sources.VectorIndexStore.DirKey, vdir)
    val servedRows =
      try graft.sources.VectorIndexStore
        .openFreshScaled(embAll, embAll).map(_._2.count()).getOrElse(-1L)
      finally spark.conf.unset(graft.sources.VectorIndexStore.DirKey)
    graft.core.Caches.releaseAll()
    println(s"[demo] scaled ANN maintainer: advanced=$advanced " +
      s"replay_skipped=${!advReplay} served_index_rows=$servedRows")

    // -- 15. the VERDICT STORE (r16): the decon tier's capstone — the
    //        suite-wide per-doc verdict report served INCREMENTALLY.
    //        Build from a backfill day, stream one ingest batch in
    //        (decoded once, probed against the suite, appended as its
    //        own day), then RETIRE the benchmark via a suite-edit
    //        batch: the flagged doc's verdict clears with ZERO probes
    //        — the store just drops the benchmark's evidence and the
    //        rollup re-serves.
    def vRel(rows: Seq[(Long, String, Option[Seq[Float]], Option[Array[Byte]])]) =
      rows.toDF("doc_id", "text", "embedding", "content")
    val vSuite = Seq("bench90" -> graft.streaming.VerdictMaintainer.corpusOf(
      vRel(Seq((90L, passage, Some(base.map(_.toFloat).toSeq),
        Some(graft.multimodal.MediaDedup.renderImage(evCaption)))))))
    val vBackfill = vRel(Seq(
      (0L, "backfill words that are clean and short",
        Some(Array.fill(16)(rnd.nextGaussian().toFloat).toSeq), None)))
    val vdirV = s"$root/verdictstore"
    graft.sources.VerdictStore.build(
      graft.streaming.VerdictMaintainer.corpusOf(vBackfill), vSuite, vdirV,
      trained = false)
    val vBatch = vRel(Seq(
      (70L, "re-crawled " + passage,
        Some(base.map(x => (x + 0.01).toFloat).toSeq),
        Some(graft.multimodal.MediaDedup.renderImage(evCaption))),
      (71L, "a clean arrival with entirely original words",
        Some(Array.fill(16)(rnd.nextGaussian().toFloat).toSeq), None)))
    val vAdv = graft.streaming.VerdictMaintainer.advanceBatch(
      vBatch, vSuite, store, "demo_verdict", vdirV, batchId = 0L)
    val vHistory = graft.streaming.VerdictMaintainer.corpusOf(
      vBackfill.unionByName(vBatch))
    spark.conf.set(graft.sources.VerdictStore.DirKey, vdirV)
    val served70 = graft.sources.VerdictStore
      .openFreshThreeEye(vHistory, vSuite.head._2).get
      .collect().sortBy(_.getLong(0))
      .map(r => s"${r.getLong(0)}:keep=${r.getBoolean(6)}").mkString(",")
    graft.core.Caches.releaseAll()
    // benchmark takedown: one suite-edit batch, zero probes
    graft.streaming.VerdictMaintainer.applySuiteBatch(
      Seq(("bench90", "retire", 0L, "", Option.empty[Seq[Float]],
        Option.empty[Array[Byte]]))
        .toDF("bench", "action", "doc_id", "text", "embedding", "content"),
      vHistory, store, "demo_verdict_suite", vdirV, batchId = 0L)
    val clearedStale = graft.sources.VerdictStore
      .openFreshThreeEye(vHistory, vSuite.head._2).isEmpty
    spark.conf.unset(graft.sources.VerdictStore.DirKey)
    graft.core.Caches.releaseAll()
    println(s"[demo] verdict store: advanced=$vAdv served=[$served70] " +
      s"retired_suite_reads_stale=$clearedStale")

    spark.stop()
    println("[demo] DONE")
  }
}
