package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.MediaQueries

class MediaDedupSpec extends SparkSpec {
  import spark.implicits._

  private val sf0001 = "/root/testdata/sf0.001"

  private def hashOf(content: Array[Byte]): Long = {
    val df = Seq((1L, content)).toDF("media_id", "content")
    MediaDedup.hashImages(df).collect()(0).getLong(1)
  }

  test("renderImage: deterministic, decodable, never white") {
    val t = "the quick brown fox jumps over the lazy dog, twice over"
    val a = MediaDedup.renderImage(t)
    val b = MediaDedup.renderImage(t)
    assert(a.sameElements(b), "same caption must render identical bytes")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a))
    assert(img.getWidth == MediaDedup.Side && img.getHeight == MediaDedup.Side)
    // LumCap < 255: no rendered pixel can reach the decoy's pure white.
    val pixels = for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      yield img.getRGB(x, y) & 0xffffff
    assert(!pixels.contains(0xffffff))
    val decoy = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(MediaDedup.whiteDecoy()))
    assert((decoy.getRGB(0, 0) & 0xffffff) == 0xffffff)
  }

  test("dHash: identical payloads collide, small edits stay near, corrupt bytes fall back") {
    val t = "a long enough caption describing some perfectly ordinary scene in detail"
    val h1 = hashOf(MediaDedup.renderImage(t))
    val h2 = hashOf(MediaDedup.renderImage(t))
    assert(h1 == h2)
    // one-character edit: the render is smooth, so the hash moves ≤ a few bits
    val h3 = hashOf(MediaDedup.renderImage(t.replace("ordinary", "ordinery")))
    assert(java.lang.Long.bitCount(h1 ^ h3) <= 6)
    // corrupt payload: deterministic digest fallback, equal blobs still match
    val junk = Array.tabulate[Byte](100)(_.toByte)
    assert(hashOf(junk) == hashOf(junk.clone()))
    assert(hashOf(junk) != hashOf(Array.tabulate[Byte](100)(i => (i + 1).toByte)))
  }

  test("nearDupPairs matches brute force EXACTLY at radius 2 (pigeonhole, not recall)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(length(col("text")) >= 50)
      .select(col("doc_id").as("media_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, t) => (id, MediaDedup.renderImage(t)) }
      .toDF("media_id", "content")
    val hashes = MediaDedup.hashImages(docs)
    val got = MediaDedup.nearDupPairs(hashes, MediaQueries.MaxHamming)
      .select("media_a", "media_b", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val hs = hashes.collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= MediaQueries.MaxHamming
    } yield (a, b, d.toLong)).toSet

    assert(got == want, s"banded=${got.size} brute=${want.size}")
    assert(want.nonEmpty, "testdata's planted near-dup texts must surface as image pairs")
    // no duplicate pair rows from the band explode
    val rows = MediaDedup.nearDupPairs(hashes, MediaQueries.MaxHamming).count()
    assert(rows == want.size.toLong)
  }

  test("nearDupProbe matches brute-force fresh×index pairs exactly (the daily shape)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(length(col("text")) >= 50)
      .select(col("doc_id").as("media_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, t) => (id, MediaDedup.renderImage(t)) }
      .toDF("media_id", "content")
    val hashes = MediaDedup.hashImages(docs)
    val fresh = hashes.filter(col("media_id") % 5 === 0)
    val index = hashes.filter(col("media_id") % 5 =!= 0)
    val got = MediaDedup.nearDupProbe(fresh, index, MediaQueries.MaxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fh = fresh.collect().map(r => (r.getLong(0), r.getLong(1)))
    val ih = index.collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (a, ha) <- fh; (b, hb) <- ih
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= MediaQueries.MaxHamming
    } yield (a, b, d.toLong)).toSet
    assert(got == want, s"probe=${got.size} brute=${want.size}")
    assert(want.nonEmpty, "fresh/index split must cut across some near-dup pair")
  }

  test("nearDupPairs: hash-identical groups pair within AND across groups, once each") {
    val img1 = MediaDedup.renderImage("first caption rendered into an image for the group test")
    val img2 = MediaDedup.renderImage("a wholly different second caption with other letter patterns")
    val media = Seq((1L, img1), (2L, img1), (3L, img1), (4L, img2))
      .toDF("media_id", "content")
    val pairs = MediaDedup.nearDupPairs(MediaDedup.hashImages(media), 2)
      .filter(col("hamming") === 0)
      .select("media_a", "media_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.intersect(Set((1L, 2L), (1L, 3L), (2L, 3L))) == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("q157 survivors equal a brute-force union-find over the exact pair set") {
    val eligible = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(length(col("text")) >= 50)
    val got = MediaQueries.q157ImageScrub(spark, sf0001)
      .collect().map(_.getLong(0)).toSeq

    // reference: brute-force pairs at the q153 radius → union-find →
    // keep component minima + untouched singletons
    val hs = MediaDedup.hashImages(
      eligible.select(col("doc_id").as("media_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, t) => (id, MediaDedup.renderImage(t)) }
        .toDF("media_id", "content"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    for { (a, ha) <- hs; (b, hb) <- hs if a < b
          if java.lang.Long.bitCount(ha ^ hb) <= MediaQueries.MaxHamming } {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = hs.map(_._1).filter(id => find(id) == id).sorted.toSeq
    assert(got == want)
    assert(got.size < hs.length, "the planted near-dup families must lose members")
  }

  test("alignmentDistances: intact scores 0, decoy ≈4-8, undecodable flagged") {
    val t1 = "an intact caption whose payload really is its own rendering"
    val t2 = "a second caption whose stored payload was swapped for the decoy"
    val rows = Seq(
      (1L, t1, MediaDedup.renderImage(t1)),
      (2L, t2, MediaDedup.whiteDecoy()),
      (3L, t1, Array.tabulate[Byte](64)(_.toByte))) // undecodable
      .toDF("doc_id", "text", "content")
    val d = MediaDedup.alignmentDistances(rows).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(d(1L) == 0.0, "lossless PNG + deterministic grid ⇒ exact zero")
    assert(d(2L) > 3.5 && d(2L) <= 8.0, s"white decoy must sit 4-8 away, got ${d(2L)}")
    assert(d(3L) == Double.MaxValue)
  }

  test("q154 recovers the planted corruption exactly (and q153 runs end-to-end)") {
    val got = MediaQueries.q154AlignmentAudit(spark, sf0001)
      .collect().map(_.getLong(0)).toSeq
    val want = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(length(col("text")) >= 50 && col("doc_id") % 7 === 3)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
    assert(want.nonEmpty)

    val pairs = MediaQueries.q153ImageNearDup(spark, sf0001)
    assert(pairs.columns.toSeq == Seq("doc_a", "doc_b", "hamming"))
    assert(pairs.count() > 0)
  }

  test("q197 media decon equals q153's pairs restricted to the cross-split orientation") {
    // Directional parity: the decon probe over the SAME corpus must
    // produce exactly the symmetric kernel's pairs that straddle the
    // train/eval split, re-oriented (train id first) — including
    // hash-identical cross-split pairs, which the symmetric kernel
    // reports at hamming 0.
    val sym = MediaQueries.q153ImageNearDup(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.core.Caches.releaseAll()
    val expected = sym.flatMap { case (a, b, h) =>
      if (a % 10 != 0 && b % 10 == 0) Some((a, b, h))
      else if (a % 10 == 0 && b % 10 != 0) Some((b, a, h))
      else None
    }.toSet
    val got = MediaQueries.q197MediaDecon(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.core.Caches.releaseAll()
    assert(got == expected,
      s"directional/symmetric divergence: missing=${expected -- got} extra=${got -- expected}")
    assert(expected.nonEmpty, "the planted near-dup texts must straddle the split")
  }

  test("deconPairs: a verbatim re-crawl of an eval image is caught at hamming 0") {
    val cap = "a benchmark photograph of a very specific reference scene indeed"
    val other = "completely unrelated training content describing something else"
    val hashes = MediaDedup.hashImages(Seq(
      (20L, MediaDedup.renderImage(cap)),      // the eval image
      (101L, MediaDedup.renderImage(cap)),     // its re-crawled training copy
      (102L, MediaDedup.renderImage(other)))   // clean training doc
      .toDF("media_id", "content"))
    val got = MediaDedup.deconPairs(
      hashes.filter(col("media_id") =!= 20L),
      hashes.filter(col("media_id") === 20L), MediaQueries.MaxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.core.Caches.releaseAll()
    assert(got == Set((101L, 20L, 0L)),
      s"exactly the re-crawl, at hamming 0, train-first: $got")
  }
}
