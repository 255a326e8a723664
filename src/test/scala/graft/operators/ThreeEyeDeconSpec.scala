package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Caches
import graft.multimodal.MediaDedup
import graft.streaming.DeconGate

/** The three-eye decontamination verdict (q198): its gram + semantic
  * half must BE q196's oracle-green relation column-for-column, its
  * media columns must be q197's rows-only pair relation rolled up, and
  * the absence rule must hold — a doc with no image keeps its two-eye
  * verdict (the rows-only parity protocol: every non-SQL-expressible
  * column pinned against its green or already-parity-pinned
  * counterpart).
  */
class ThreeEyeDeconSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q198: two-eye columns ≡ q196; media columns ≡ q197 rolled up; no-image docs keep their two-eye verdict") {
    val three = MediaQueries.q198ThreeEyeDecon(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(7)) None else Some(r.getLong(7))),
        (r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5)),
          if (r.isNullAt(8)) None else Some(r.getLong(8))),
        r.getBoolean(6))).toMap
    Caches.releaseAll()
    val two = SubstringDedup.q196DeconVerdict(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(5)) None else Some(r.getLong(5))), r.getBoolean(4))).toMap
    Caches.releaseAll()
    val pairs = MediaQueries.q197MediaDecon(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    Caches.releaseAll()

    // Same doc set: the media eye adds columns, never rows (eligible
    // image docs are a subset of the documents train split).
    assert(three.keySet == two.keySet,
      s"three-eye and two-eye verdicts must cover the same docs " +
        s"(only-three: ${(three.keySet -- two.keySet).take(5)}, " +
        s"only-two: ${(two.keySet -- three.keySet).take(5)})")

    // Eye 1+2: column-for-column equality with oracle-green q196.
    three.foreach { case (doc, (twoCols, _, _)) =>
      assert(twoCols == two(doc)._1,
        s"doc $doc gram+semantic evidence must equal q196's: $twoCols vs ${two(doc)._1}")
    }

    // Eye 3: exactly q197's pair relation rolled up per train doc.
    val rollup = pairs.groupBy(_._1).map { case (d, ps) =>
      d -> ((ps.size.toLong, Some(ps.map(_._3).min), Some(ps.map(_._2).min)))
    }
    three.foreach { case (doc, (_, mediaCols, _)) =>
      assert(mediaCols == rollup.getOrElse(doc, (0L, None, None)),
        s"doc $doc media evidence must equal q197's rollup: $mediaCols vs ${rollup.get(doc)}")
    }

    // keep = two-eye keep ∧ media-clean; in particular every doc the
    // media eye implicates and the other two eyes cleared flips.
    three.foreach { case (doc, (_, (nImg, _, _), keep)) =>
      assert(keep == (two(doc)._2 && nImg == 0L),
        s"doc $doc keep must be the three-eye conjunction")
    }

    // Absence rule, on REAL absent-image docs: train docs too short to
    // render (len < 50) carry no media evidence and keep their q196
    // verdict — the fixture must actually contain some.
    val noImage = spark.read.parquet(s"$sf/documents.parquet")
      .where(col("doc_id") % 10 =!= 0 && length(col("text")) < 50)
      .select("doc_id").collect().map(_.getLong(0))
    assert(noImage.nonEmpty, "fixture must contain train docs with no image")
    noImage.foreach { doc =>
      val (_, mediaCols, keep) = three(doc)
      assert(mediaCols == ((0L, None, None)) && keep == two(doc)._2,
        s"imageless doc $doc must keep its two-eye verdict untouched")
    }
  }

  test("q199: media coverage is exactly q197's pairs rolled up per eval doc, zeros reported for clean eval docs") {
    val pairs = MediaQueries.q197MediaDecon(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    Caches.releaseAll()
    val got = MediaQueries.q199MediaCoverage(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    Caches.releaseAll()
    val rollup = pairs.groupBy(_._2).map { case (ev, ps) =>
      ev -> ((ps.size.toLong, Some(ps.map(_._3).min), Some(ps.map(_._1).min)))
    }
    // Every eval doc of the suite gets a row — matched ones carry the
    // exact rollup, clean ones (including docs too short to render an
    // image) report 0 with null evidence.
    val evalIds = spark.read.parquet(s"$sf/documents.parquet")
      .where(col("doc_id") % 10 === 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got.keySet == evalIds, "one coverage row per eval doc, clean or not")
    assert(rollup.keySet.nonEmpty && rollup.keySet != evalIds,
      "fixture must have both matched and clean eval docs for the test to bite")
    got.foreach { case (ev, cols) =>
      assert(cols == rollup.getOrElse(ev, (0L, None, None)),
        s"eval doc $ev coverage must equal q197's rollup: $cols vs ${rollup.get(ev)}")
    }
  }

  test("q200: the media scrub keeps exactly the train docs q197 does not flag, with the pair rollup as evidence") {
    val pairs = MediaQueries.q197MediaDecon(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    Caches.releaseAll()
    val got = MediaQueries.q200MediaScrub(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    Caches.releaseAll()
    val flagged = pairs.groupBy(_._1).map { case (d, ps) =>
      d -> ((Some(ps.map(_._2).min), Some(ps.map(_._3).min)))
    }
    val trainIds = spark.read.parquet(s"$sf/documents.parquet")
      .where(col("doc_id") % 10 =!= 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got.keySet == trainIds, "one scrub row per train doc, imaged or not")
    assert(flagged.nonEmpty && flagged.keySet != trainIds,
      "fixture must have both flagged and surviving train docs")
    got.foreach { case (doc, (keep, w, h)) =>
      flagged.get(doc) match {
        case Some((fw, fh)) =>
          assert(!keep && w == fw && h == fh,
            s"flagged doc $doc must drop with the rollup evidence: ($keep, $w, $h) vs ($fw, $fh)")
        case None =>
          assert(keep && w.isEmpty && h.isEmpty,
            s"unflagged doc $doc (including imageless) must keep with null evidence")
      }
    }
  }

  test("q198 fully store-served: all three eyes read their stores and the verdict is byte-identical to inline") {
    // The 100 TB suite-edit shape: gram suite from DeconStore, semantic
    // suite from SemanticDeconStore, train image hashes from
    // MediaHashStore — a re-probe touches three indexes and re-derives
    // NOTHING corpus-sided. Parity must be exact, not approximate.
    import spark.implicits._
    val inline = MediaQueries.q198ThreeEyeDecon(spark, sf).collect()
      .map(_.toString).toSet
    Caches.releaseAll()

    val d = spark.read.parquet(s"$sf/documents.parquet")
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val gramDir = tmpDir("three_gram_store")
    graft.sources.DeconStore.build(d.filter(col("doc_id") % 10 === 0), gramDir)
    Caches.releaseAll()
    val semDir = tmpDir("three_sem_store")
    // codebookFrom = the full table: the inline kernel derives its
    // centroids from train ∪ eval, so the frozen store codebook must
    // come from the same relation for exact parity.
    graft.sources.SemanticDeconStore.build(
      e.filter(col("vec_id") % 10 === 0), semDir, codebookFrom = Some(e),
      trained = false)
    Caches.releaseAll()
    val mediaDir = tmpDir("three_media_store")
    // The EXPOSED train relation, not a re-derived predicate copy —
    // the same drift argument as MediaQueries.deconTrainDocs' scaladoc
    // (a stale copy would digest-mismatch and fail this test's
    // freshness precondition opaquely on any predicate change).
    val train = MediaQueries.deconTrainDocs(spark, sf)
    graft.sources.MediaHashStore.buildSourced(train,
      MediaDedup.hashImages(train.as[(Long, String)]
        .map { case (id, t) => (id, MediaDedup.renderImage(t)) }
        .toDF("media_id", "content")), mediaDir)
    Caches.releaseAll()

    spark.conf.set(graft.sources.DeconStore.DirKey, gramDir)
    spark.conf.set(graft.sources.SemanticDeconStore.DirKey, semDir)
    spark.conf.set(graft.sources.MediaHashStore.DirKey, mediaDir)
    try {
      assert(graft.sources.DeconStore.openFresh(
        d.filter(col("doc_id") % 10 === 0)).isDefined, "gram store fresh")
      assert(graft.sources.SemanticDeconStore.openFresh(
        e.filter(col("vec_id") % 10 === 0)).isDefined, "semantic store fresh")
      assert(graft.sources.MediaHashStore.openFreshFor(train).isDefined,
        "media store fresh")
      val served = MediaQueries.q198ThreeEyeDecon(spark, sf).collect()
        .map(_.toString).toSet
      assert(served == inline,
        "the fully store-served three-eye verdict must equal inline")
    } finally {
      spark.conf.unset(graft.sources.DeconStore.DirKey)
      spark.conf.unset(graft.sources.SemanticDeconStore.DirKey)
      spark.conf.unset(graft.sources.MediaHashStore.DirKey)
      Caches.releaseAll()
    }
  }

  test("flagThreeEye: a benchmark image re-crawled under a rewritten caption drops on the media eye ALONE") {
    val passage = "all rights reserved worldwide under the berne convention " +
      "and no part of this publication may be reproduced without permission "
    def filler(tag: String, n: Int): String =
      Iterator.from(0).map(i => s"$tag$i ").take(n).mkString.take(n)
        .dropRight(1) + tag.head
    val rnd = new scala.util.Random(47)
    val base = Array.fill(16)(rnd.nextGaussian())
    val evCaption = "a benchmark photograph of a rare astronomical event over calm water"

    val evText = Seq((90L, filler("ea", 35) + passage + filler("eb", 25)))
      .toDF("doc_id", "text")
    val evEmb = ((0 until 16).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq)) :+
      ((90L, base.map(_.toFloat).toSeq))).toDF("vec_id", "embedding")
    val evImg = MediaDedup.hashImages(
      Seq((90L, MediaDedup.renderImage(evCaption))).toDF("media_id", "content"))

    // 60: clean text + clean embedding, but its IMAGE is the benchmark's
    //     own (re-crawled, caption rewritten) — only the media eye sees it.
    // 61: verbatim gram leak, NO image attachment — media columns must
    //     stay 0/null and the gram verdict must stand.
    // 62: clean under all three eyes, with its own unrelated image.
    val batchText = Seq(
      (60L, filler("dz", 130)),
      (61L, filler("da", 50) + passage + filler("db", 30)),
      (62L, filler("dy", 110))).toDF("doc_id", "text")
    val batchEmb = Seq(
      (60L, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq),
      (61L, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq),
      (62L, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val batchImg = MediaDedup.hashImages(Seq(
      (60L, MediaDedup.renderImage(evCaption)),
      (62L, MediaDedup.renderImage("an entirely unrelated picture of dense machinery in a factory hall")))
      .toDF("media_id", "content"))

    val got = DeconGate.flagThreeEye(batchText, evText, batchEmb, evEmb,
      batchImg, evImg, tau = 0.9).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)), r.getBoolean(6),
        if (r.isNullAt(8)) None else Some(r.getLong(8))))).toMap
    Caches.releaseAll()

    val L = passage.length.toLong
    assert(got(60L) == ((0L, 0L, 1L, Some(0L), false, Some(90L))),
      s"the re-crawled image must drop doc 60 on the media eye alone (hamming 0, witness 90): ${got(60L)}")
    assert(got(61L) == ((L, 0L, 0L, None, false, None)),
      s"the imageless gram leak keeps its two-eye verdict, media columns absent: ${got(61L)}")
    assert(got(62L) == ((0L, 0L, 0L, None, true, None)),
      s"the clean doc keeps under all three eyes: ${got(62L)}")
  }

  test("q201: the eye-overlap summary is exactly q198 rolled up, all 8 combinations reported") {
    val verdicts = MediaQueries.q198ThreeEyeDecon(spark, sf).collect()
      .map(r => (r.getLong(1) > 0L, r.getLong(2) > 0L, r.getLong(4) > 0L,
        r.getLong(1), r.getDouble(3)))
    Caches.releaseAll()
    val got = MediaQueries.q201EyeOverlap(spark, sf).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)) ->
        ((r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    Caches.releaseAll()
    val combos = for { g <- Seq(false, true); s <- Seq(false, true)
      i <- Seq(false, true) } yield (g, s, i)
    assert(got.keySet == combos.toSet,
      s"all 8 eye combinations must be reported, zeros included: ${got.keySet}")
    combos.foreach { c =>
      val cell = verdicts.filter(v => (v._1, v._2, v._3) == c)
      val want = (cell.size.toLong,
        cell.map(_._4).sum,
        if (cell.isEmpty) 0.0 else cell.map(_._5).max)
      assert(got(c) == want,
        s"combination $c must equal q198's in-memory rollup: ${got(c)} vs $want")
    }
    // the fixture's planted structure makes the report non-degenerate:
    // some docs are dirty, most are clean
    assert(got((false, false, false))._1 > 0L && got.exists(kv => kv._1 != ((false, false, false)) && kv._2._1 > 0L))
  }
}
