package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q75 composition semantics the sf0.01 oracle run can't demonstrate:
  * at that scale every surviving document is shorter than one chunk and
  * every (split, grp) shard fits in bin 0, so the chunk explode and the
  * bin rollover are degenerate. These tests build documents long enough
  * to chunk 6 ways and roll over the 512-token bin, and pin the one
  * property that makes the composition sound at all: the mixture hash
  * must be independent of the eval-split hash (same hash → every eval
  * bucket 90..99 fails every mixture rate ≤ 80 → the eval split is
  * silently deleted).
  */
class TrainingUnitsSpec extends SparkSpec {
  import spark.implicits._

  // 512 tokens, every 8th is the stopword 'the': quality passes on
  // type-token ratio + stopword-rate (the 20..400 length point is
  // deliberately forfeited — that's what makes the doc long enough to
  // chunk), lang-pred passes on marker rate + ' th' rate, and the
  // per-doc salt in the filler tokens keeps fingerprints distinct.
  private def longDoc(i: Long): (Long, String, String, Long) = {
    val text = (0 until 512)
      .map(j => if (j % 8 == 0) "the" else s"w${i}x$j")
      .mkString(" ")
    (i, "en", text, text.length.toLong)
  }

  // chunkOn geometry for a 512-token doc: starts 0,96,...,480.
  private val ExpectedSizes = Seq(128L, 128L, 128L, 128L, 128L, 32L)

  test("q75: long docs chunk 6 ways, packs obey the running-sum contract, bins roll over") {
    val docRel = (1L to 24L).map(longDoc).toDF("doc_id", "lang", "text", "n_chars")
    val rows = CurationQueries.trainingUnitsOn(docRel)
      .select("doc_id", "chunk_idx", "lang", "split", "chunk_tokens", "grp",
        "pack_bin", "pack_offset")
      .collect()
    assert(rows.nonEmpty, "mixture at rate 80 must keep some of 24 docs")

    // Every surviving doc explodes into the full chunk ladder.
    rows.groupBy(_.getLong(0)).foreach { case (id, rs) =>
      val sizes = rs.sortBy(_.getLong(1)).map(_.getLong(4)).toSeq
      assert(sizes == ExpectedSizes, s"doc $id chunk sizes: $sizes")
      assert(rs.map(_.getString(3)).distinct.length == 1,
        s"doc $id split must be a per-document decision")
    }

    // Packing invariant per (split, grp): offsets are the running sum of
    // prior chunk_tokens in (doc_id, chunk_idx) order; bin = offset/512.
    rows.groupBy(r => (r.getString(3), r.getLong(5))).foreach { case (key, rs) =>
      var cum = 0L
      rs.sortBy(r => (r.getLong(0), r.getLong(1))).foreach { r =>
        assert(r.getLong(7) == cum, s"$key offset drift at doc ${r.getLong(0)}")
        assert(r.getLong(6) == cum / 512, s"$key bin drift at doc ${r.getLong(0)}")
        cum += r.getLong(4)
      }
    }

    // One 512-token doc emits 672 cumulative chunk tokens (overlap), so
    // even a singleton group crosses the 512 budget — rollover must occur.
    assert(rows.map(_.getLong(6)).max >= 1L, "no pack ever left bin 0")
    graft.core.Caches.releaseAll()
  }

  test("q75: eval-split docs survive the mixture (salted hash is independent)") {
    // Ids whose UNSALTED bucket is 90..99 (→ eval) but whose salted
    // mixture draw passes the en rate 80. With an unsalted mixture these
    // would all be dropped (90..99 < 80 is never true) and the eval
    // split would be empty — the exact failure MixSalt exists to prevent.
    val ids = spark.range(1, 5000).toDF("id")
      .withColumn("b", SamplingQueries.hashBucket(col("id")))
      .withColumn("mix", SamplingQueries.hashBucket(
        concat(col("id").cast("string"), lit("|mix")))) // mirrors MixSalt
      .where(col("b") >= 90 && col("mix") < 80)
      .select("id").as[Long].head(3).toSeq
    assert(ids.length == 3)

    val docRel = ids.map(longDoc).toDF("doc_id", "lang", "text", "n_chars")
    val bySplit = CurationQueries.trainingUnitsOn(docRel)
      .select("doc_id", "split").distinct()
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ids.forall(bySplit.get(_).contains("eval")),
      s"eval-bucket docs must survive mixture and land in eval: $bySplit")
    graft.core.Caches.releaseAll()
  }
}
