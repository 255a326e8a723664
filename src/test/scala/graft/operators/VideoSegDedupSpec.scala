package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.VideoSegDedup

class VideoSegDedupSpec extends SparkSpec {
  import spark.implicits._

  private val sf0001 = "/root/testdata/sf0.001"

  test("JVM chunker matches q85's SQL chunker fingerprint-for-fingerprint on real docs") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").select("doc_id", "text")
    // reference: the oracle-checked DataFrame chunker
    val ref = CurationQueries.cdcChunksOn(docs)
      .select(col("doc_id"), col("chunk"), col("chunk_fp"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getLong(1)).map(_.getString(2)).toSeq
      }
    val jvm = docs.as[(Long, String)].collect().map { case (id, text) =>
      id -> VideoSegDedup.cdcChunks(text).map { seg =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(seg.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      }
    }.toMap
    assert(jvm.keySet == ref.keySet)
    for ((id, fps) <- ref) assert(jvm(id) == fps, s"doc $id chunk fingerprints diverge")
  }

  test("GIF container roundtrip is lossless: every segment's watermark survives") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu " * 8
    val segs = VideoSegDedup.cdcChunks(text.trim)
    assert(segs.nonEmpty)
    val videos = VideoSegDedup.renderVideos(Seq((7L, text.trim)).toDF("doc_id", "text"))
    val content = videos.collect()(0).getAs[Array[Byte]]("content")
    val marks = VideoSegDedup.readFrameMarks(content)
    assert(marks.size == segs.size, "one frame per segment")
    val wantFps = segs.map(s => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString)
    assert(marks.map(_._1) == wantFps, "md5 watermark must survive the GIF palette")
    val wantN = segs.map(s => math.min(255, s.split(" ", -1).length))
    assert(marks.map(_._2) == wantN, "token-count watermark must survive")
    // corrupt payload: no frames, no assertion of shared content
    assert(VideoSegDedup.readFrameMarks(Array.tabulate[Byte](64)(_.toByte)).isEmpty)
  }

  test("shared segments surface through the container; disjoint texts don't") {
    // A shared run only yields a shared SEGMENT if it contains a full
    // boundary-to-boundary chunk — construct one: find two CDC boundary
    // words and sandwich ≥8 non-boundary fillers between them, so the
    // interior chunk sits wholly inside the shared run in any host doc.
    def isBoundary(w: String): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(w.getBytes("UTF-8"))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      h % 16 == 0
    }
    val words = (0 until 2000).map(i => s"w$i")
    val bounds = words.filter(isBoundary).take(2)
    val fillers = words.filterNot(isBoundary).take(10)
    assert(bounds.size == 2)
    val shared = (bounds(0) +: fillers :+ bounds(1)).mkString("", " ", " ")
    val docs = Seq(
      (1L, s"prefix only here ${shared}and a suffix for the first"),
      (2L, s"another lead-in completely different ${shared}closing words two"),
      (3L, "totally unrelated content with none of the duplicated run at all"))
      .toDF("doc_id", "text")
    val fps = VideoSegDedup.segmentFingerprints(VideoSegDedup.renderVideos(docs))
    val pairs = VideoSegDedup.sharedSegmentPairs(fps)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the shared run spans ≥1 full interior CDC segment ⇒ pair (1,2)
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("VideoSegStore: advance/retire serves pairs as an index rebuilt without the day, zero re-decodes") {
    import graft.sources.VideoSegStore
    def isBoundary(w: String): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(w.getBytes("UTF-8"))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      h % 16 == 0
    }
    val words = (0 until 3000).map(i => s"v$i")
    val bounds = words.filter(isBoundary).take(4)
    val fillers = words.filterNot(isBoundary)
    assert(bounds.size == 4)
    def run(b: Int, off: Int) =
      (bounds(b) +: fillers.slice(off, off + 10) :+ bounds(b + 1)).mkString("", " ", " ")
    val sharedA = run(0, 0)   // the clip day-0 video 10 shares with fresh video 1
    val sharedB = run(2, 20)  // the clip day-1 video 20 shares with fresh video 2
    def fpsOf(rows: (Long, String)*) =
      VideoSegDedup.segmentFingerprints(
        VideoSegDedup.renderVideos(rows.toSeq.toDF("doc_id", "text")))
    val day0 = fpsOf(
      (10L, s"day zero intro segment here ${sharedA}and day zero outro"),
      (11L, "entirely unique day zero content with nothing shared anywhere"))
    val day1 = fpsOf(
      (20L, s"day one lead material ${sharedB}day one closing remarks"),
      (21L, "more unique day one material sharing no clip with anything"))
    val fresh = fpsOf(
      (1L, s"fresh upload first ${sharedA}fresh upload tail one"),
      (2L, s"fresh upload second ${sharedB}fresh upload tail two"))

    def pairsAgainst(idx: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val out = VideoSegDedup.sharedSegmentPairs(fresh.unionByName(idx))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      graft.core.Caches.releaseAll()
      out
    }

    val dir = tmpDir("videosegstore")
    VideoSegStore.build(day0, dir, day = 0)
    VideoSegStore.advanceDay(day1, dir, day = 1)
    val both = pairsAgainst(VideoSegStore.open(spark, dir))
    assert(both.contains((1L, 10L)) && both.contains((2L, 20L)), both.toString)

    // Takedown day 0: pairs equal an index REBUILT from day 1 alone —
    // the retired day's videos unfindable, day 1 never re-decoded.
    VideoSegStore.retireDay(spark, dir, day = 0)
    val retired = pairsAgainst(VideoSegStore.open(spark, dir))
    val rebuiltDir = tmpDir("videosegstore_rebuilt")
    VideoSegStore.build(day1, rebuiltDir, day = 1)
    assert(retired == pairsAgainst(VideoSegStore.open(spark, rebuiltDir)),
      "retired-day pairs must equal a from-scratch index without that day")
    assert(!retired.exists(p => p._1 == 10L || p._2 == 10L),
      "the taken-down video must be unfindable")

    // replayed advance converges; torn stores refuse to serve
    VideoSegStore.advanceDay(day1, dir, day = 1)
    assert(pairsAgainst(VideoSegStore.open(spark, dir)) == retired)
    val fsys = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fsys.delete(new org.apache.hadoop.fs.Path(s"$dir/segs/day=1"), true)
    intercept[Exception] { VideoSegStore.open(spark, dir).count() }

    // zero-meta torn hazard: retire everything, then plant an orphan
    // day partition (a crashed advance) — open must raise, not serve
    // an empty index over live data; absent orphans it serves empty.
    val dir2 = tmpDir("videosegstore_empty")
    VideoSegStore.build(day0, dir2, day = 0)
    VideoSegStore.retireDay(spark, dir2, day = 0)
    assert(VideoSegStore.open(spark, dir2).count() == 0L,
      "a fully-retired store serves an empty relation, not a schema error")
    day1.withColumn("day", lit(3))
      .write.partitionBy("day").mode("append").parquet(s"$dir2/segs")
    intercept[Exception] { VideoSegStore.open(spark, dir2).count() }

    // crashed-BUILD repair (ADVICE r13): segs/day=N written, meta never
    // committed. A replayed advance must REWRITE the orphan, not append
    // duplicate (video_id, seg_fp) rows into it; and retireDay must be
    // able to repair the torn store instead of throwing on missing meta.
    val dir3 = tmpDir("videosegstore_torn")
    day0.withColumn("day", lit(0))
      .write.partitionBy("day").mode("append").parquet(s"$dir3/segs")
    VideoSegStore.advanceDay(day0, dir3, day = 0)
    val healed = VideoSegStore.open(spark, dir3)
    assert(healed.count() == healed.distinct().count(),
      "replayed advance over a crashed build must not duplicate rows")
    assert(healed.count() == day0.select("video_id", "seg_fp").count())
    val dir4 = tmpDir("videosegstore_torn2")
    day0.withColumn("day", lit(0))
      .write.partitionBy("day").mode("append").parquet(s"$dir4/segs")
    VideoSegStore.retireDay(spark, dir4, day = 0) // must not throw
    VideoSegStore.advanceDay(day1, dir4, day = 1)
    assert(VideoSegStore.open(spark, dir4).count() ==
      day1.select("video_id", "seg_fp").count(),
      "retire must repair a torn store so later advances serve cleanly")
  }

  test("q155 end-to-end equals the pure-SQL-side reference at sf0.001") {
    val got = MediaQueries.q155VideoSegdup(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // text-side reference: q85 chunker + the same MinTokens/DfCap rules,
    // no container anywhere near it
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").select("doc_id", "text")
    val big = CurationQueries.cdcChunksOn(docs)
      .filter(col("n_tokens") >= VideoSegDedup.MinTokens)
      .select(col("doc_id"), col("chunk_fp")).distinct()
    val ok = big.groupBy("chunk_fp").count()
      .filter(col("count").between(2, VideoSegDedup.DfCap))
      .select("chunk_fp")
    val want = big.join(ok, "chunk_fp")
      .select(col("doc_id").as("a"), col("chunk_fp"))
      .join(big.join(ok, "chunk_fp").select(col("doc_id").as("b"), col("chunk_fp")), "chunk_fp")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
      .orderBy("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(want.nonEmpty, "testdata's planted shared spans must survive chunking")
  }
}
