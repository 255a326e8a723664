package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Caches
import graft.sources.TokenizerStore

/** Train-once/serve-many for the tokenizer tier: with a fresh
  * TokenizerStore configured, every encode path (BPE q122, byte-BPE,
  * unigram q158/q159, WordPiece q163) reproduces its inline-train
  * result EXACTLY from the stored artifact; a stale or missing store
  * falls back to inline training — the SignatureStore contract applied
  * to tokenizers.
  */
class TokenizerStoreSpec extends SparkSpec {
  import spark.implicits._

  private def corpusDf = Seq(
    (1L, "low low lower lowest"),
    (2L, "the cat sat on the mat"),
    (3L, "the lower deck of the boat"),
    (4L, "日本語 の 文書 🙂 mixes scripts"))
    .toDF("doc_id", "text")

  private def rowsOf(df: DataFrame): Set[String] = {
    val out = df.collect().map(_.toString).toSet
    Caches.releaseAll()
    out
  }

  private def withStore(dir: String, trust: Boolean = false)(body: => Unit): Unit = {
    spark.conf.set(TokenizerStore.DirKey, dir)
    if (trust) spark.conf.set(TokenizerStore.TrustKey, "true")
    try body
    finally {
      spark.conf.unset(TokenizerStore.DirKey)
      spark.conf.unset(TokenizerStore.TrustKey)
      Caches.releaseAll()
    }
  }

  test("store-served encodes are byte-identical to inline training, and the store actually serves") {
    val corpus = corpusDf
    // Inline (no store configured) results for every consumer.
    val directBpe = rowsOf(BpeQueries.bpeEncodeOn(corpus))
    val directByte = rowsOf(BpeQueries.byteBpeEncodeOn(corpus))
    val directUni = rowsOf(UnigramQueries.vocabToDf(spark, UnigramQueries.vocabFor(corpus)))
    val directWp = rowsOf(WordPieceQueries.wpEncodeOn(corpus))

    val dir = tmpDir("tokstore")
    TokenizerStore.build(corpus, dir)
    Caches.releaseAll()
    withStore(dir) {
      // The store must actually serve (not silently fall back) ...
      assert(TokenizerStore.openBpeMerges(corpus).isDefined, "store must be fresh")
      assert(TokenizerStore.openByteBpeMerges(corpus).isDefined)
      assert(TokenizerStore.openUnigramVocab(corpus).isDefined)
      assert(TokenizerStore.openWordPiece(corpus).isDefined)
      // ... and serve the SAME artifacts the inline trainers produce.
      assert(rowsOf(BpeQueries.bpeEncodeOn(corpus)) == directBpe)
      assert(rowsOf(BpeQueries.byteBpeEncodeOn(corpus)) == directByte)
      assert(rowsOf(UnigramQueries.vocabToDf(spark,
        UnigramQueries.vocabFor(corpus))) == directUni)
      assert(rowsOf(WordPieceQueries.wpEncodeOn(corpus)) == directWp)
    }
  }

  test("a stale store is detected and the encode is computed for the OFFERED corpus") {
    val corpus = corpusDf
    val dir = tmpDir("tokstore_stale")
    TokenizerStore.build(corpus, dir)
    Caches.releaseAll()
    // Same row count, one document's content mutated — the case a
    // row-count freshness check would miss. The mutated corpus has a
    // different vocabulary ("zzzz" repeats), so a stale artifact would
    // produce measurably different piece counts.
    val mutated = corpusDf.withColumn("text",
      when(col("doc_id") === 2L, lit("zzzz zzzz zzzz zzzz zzzz")).otherwise(col("text")))
    val directMut = rowsOf(BpeQueries.bpeEncodeOn(mutated))
    withStore(dir) {
      assert(TokenizerStore.openBpeMerges(mutated).isEmpty,
        "digest must catch a content mutation at identical row count")
      assert(rowsOf(BpeQueries.bpeEncodeOn(mutated)) == directMut,
        "fallback must train on the offered corpus")
      // trust mode skips the digest scan and accepts the store as-is.
      spark.conf.set(TokenizerStore.TrustKey, "true")
      assert(TokenizerStore.openBpeMerges(mutated).isDefined,
        "trust mode must accept without a digest scan")
    }
  }

  test("freshness digests once per (corpus, dir) per session; a rebuild re-verifies") {
    val corpus = corpusDf
    val dir = tmpDir("tokstore_scans")
    TokenizerStore.build(corpus, dir)
    Caches.releaseAll()
    withStore(dir) {
      val before = TokenizerStore.digestScans.get()
      // q166's shape: four artifact opens against one corpus — before
      // the verdict cache this digested the corpus four times.
      assert(TokenizerStore.openBpeMerges(corpus).isDefined)
      assert(TokenizerStore.openByteBpeMerges(corpus).isDefined)
      assert(TokenizerStore.openUnigramVocab(corpus).isDefined)
      assert(TokenizerStore.openWordPiece(corpus).isDefined)
      assert(TokenizerStore.digestScans.get() == before + 1,
        "four opens must share ONE corpus digest scan")
      // A rebuild drops the dir's cached verdicts: the next open must
      // re-verify against the new meta, not serve the old verdict.
      TokenizerStore.build(corpus, dir)
      Caches.releaseAll()
      assert(TokenizerStore.openBpeMerges(corpus).isDefined)
      assert(TokenizerStore.digestScans.get() == before + 2,
        "a rebuilt store must force re-verification")
      // An EXTERNAL rebuild (another process replacing the artifacts —
      // this JVM's build() never runs, so no invalidate fires) changes
      // the meta's mtime, which is part of the verdict key: the next
      // open must re-verify instead of serving the old verdict.
      val fsys = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      Thread.sleep(1100) // HDFS-API mtime granularity is one second
      fsys.setTimes(new org.apache.hadoop.fs.Path(s"$dir/meta"),
        System.currentTimeMillis(), -1)
      assert(TokenizerStore.openBpeMerges(corpus).isDefined)
      assert(TokenizerStore.digestScans.get() == before + 3,
        "an externally rebuilt store (meta mtime moved) must re-verify")
    }
  }

  test("an unreadable store root falls back without error") {
    withStore(tmpDir("tokstore_missing") + "/never_written") {
      assert(TokenizerStore.openBpeMerges(corpusDf).isEmpty)
      assert(rowsOf(BpeQueries.bpeEncodeOn(corpusDf)).nonEmpty)
    }
  }
}
