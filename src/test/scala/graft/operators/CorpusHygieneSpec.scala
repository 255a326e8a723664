package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed semantics for the round-7 operator batch — the cases
  * the uniform sf0.01 oracle diff can't stress: first-occurrence
  * election across documents (q92), exact e-fold decay weights (q93),
  * a median that shrugs off the outlier that wrecks a mean (q94),
  * overlap pairs that straddle equi-join bin boundaries (q95), cap
  * tie-breaks (q96), entropy of degenerate alphabets (q97), and the
  * Morton bit-interleave itself (q98).
  */
class CorpusHygieneSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------------- q92
  private def docsOf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("q92: first occurrence wins corpus-wide; later copies drop; full-loser doc keeps NULL md5") {
    // 8-word segments. doc 1: segments A B. doc 2: copies A then has C.
    // doc 3: is exactly A — every segment loses → NULL kept_md5.
    val segA = (1 to 8).map(i => s"a$i").mkString(" ")
    val segB = (1 to 8).map(i => s"b$i").mkString(" ")
    val segC = (1 to 8).map(i => s"c$i").mkString(" ")
    val got = CorpusQueries.segmentDedupOn(docsOf(
      1L -> s"$segA $segB", 2L -> s"$segA $segC", 3L -> segA))
      .orderBy("doc_id")
      .select("doc_id", "n_seg", "n_kept", "kept_md5")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got(0) == ((1L, 2L, 2L, md5Of(s"$segA $segB"))))
    assert(got(1) == ((2L, 2L, 1L, md5Of(segC))))
    assert(got(2)._3 == 0L && got(2)._4 == null, got(2).toString)
  }

  test("q92: within one document the EARLIER position keeps a repeated segment") {
    val segA = (1 to 8).map(i => s"a$i").mkString(" ")
    val segB = (1 to 8).map(i => s"b$i").mkString(" ")
    // doc: A B A — third segment is a self-repeat; kept text is "A B".
    val got = CorpusQueries.segmentDedupOn(docsOf(1L -> s"$segA $segB $segA"))
      .collect().head
    assert(got.getAs[Long]("n_seg") == 3L)
    assert(got.getAs[Long]("n_kept") == 2L)
    assert(got.getAs[String]("kept_md5") == md5Of(s"$segA $segB"))
  }

  private def md5Of(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // ----------------------------------------------------------- q93
  test("q93: score is value at now, value/e one tau earlier, summed exactly") {
    val df = Seq(
      (1L, "2024-01-02 00:00:00", 10.0), // at now → weight 1
      (1L, "2024-01-01 00:00:00", 10.0), // one day → weight 1/e
      (2L, "2024-01-02 00:00:00", 7.0))
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp_ntz")).drop("ts_s")
    val got = TemporalQueries.q93DecayScoreOn(df)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val expected1 = BigDecimal(10.0 + 10.0 * math.exp(-1.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((2L, expected1)), got.toString)
    assert(got(2L) == ((1L, 7.0)))
  }

  // ----------------------------------------------------------- q94
  test("q94: one wild value can't move the median; it IS the outlier") {
    val df = (Seq.fill(9)(("sensor", 5.0)) :+ (("sensor", 1e6)))
      .toDF("event_type", "value")
    val got = RelationalExtras.q94MadOutliersOn(df).collect().head
    assert(got.getAs[Long]("n") == 10L)
    assert(got.getAs[Double]("med") == 5.0)
    assert(got.getAs[Double]("mad") == 0.0)
    assert(got.getAs[Long]("n_outliers") == 1L)
  }

  test("q94: symmetric spread flags only points beyond 3·1.4826·MAD") {
    // values 1..9 around med=5: devs 0..4, mad=2 → threshold 8.8956.
    // Add 20 (dev 15) and -20 (dev 25): only those two flag.
    val df = ((1 to 9).map(v => ("t", v.toDouble)) ++ Seq(("t", 20.0), ("t", -20.0)))
      .toDF("event_type", "value")
    val got = RelationalExtras.q94MadOutliersOn(df).collect().head
    assert(got.getAs[Double]("med") == 5.0)
    assert(got.getAs[Double]("mad") == 3.0) // devs 0,1,1,2,2,3,3,4,4,15,25 → median 3
    assert(got.getAs[Long]("n_outliers") == 2L)
  }

  // ----------------------------------------------------------- q95
  test("q95: overlap spanning several join bins emits exactly one pair; disjoint emits none") {
    // Island: user 1, event_id 240 (dur 60 s) starting 30 s before an
    // hour boundary → the island [−30, +30] covers two 3600 s bins.
    // Incident: error event_id 970 (97·10) at +0 for user 2 → window
    // [−60, +60] also covers both bins. Without distinct() the pair
    // would appear twice. User 2's own error island [0, +70] overlaps
    // its incident too. A far-away island must not pair at all.
    val df = Seq(
      (1L, 240L, "2024-01-01 00:59:30", "click"),
      (2L, 970L, "2024-01-01 01:00:00", "error"),
      (3L, 240L, "2024-01-03 12:00:00", "click"))
      .toDF("user_id", "event_id", "ts_s", "event_type")
      .withColumn("ts", col("ts_s").cast("timestamp_ntz")).drop("ts_s")
    val got = TemporalQueries.q95IntervalJoinOn(df)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(t => t._1).toSeq
    // island 1 [59:30, 60:30] × incident [59:00, 61:00] → 60 s overlap
    // island 2 [60:00, 61:10] × incident [59:00, 61:00] → 60 s overlap
    assert(got == Seq((1L, 970L, 60L), (2L, 970L, 60L)), got.mkString(", "))
  }

  // ----------------------------------------------------------- q96
  test("q96: cap keeps longest-first with doc_id tie-break, per source independently") {
    val df = Seq(
      (1L, "s1", 100L), (2L, "s1", 100L), (3L, "s1", 50L),
      (4L, "s2", 10L))
      .toDF("doc_id", "source", "n_chars")
    val got = CurationQueries.sourceCapOn(df)
      .orderBy("source", "rk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSeq
    // Cap is 20 — all rows survive here; the contract under test is
    // the deterministic ranking (ties by doc_id) and per-source resets.
    assert(got == Seq((1L, "s1", 1L), (2L, "s1", 2L), (3L, "s1", 3L), (4L, "s2", 1L)))
  }

  // ----------------------------------------------------------- q97
  test("q97: uniform two-char alphabet → 1 bit; single char → 0; weighted case exact") {
    val df = Seq((1L, "aaaa"), (2L, "abab"), (3L, "aab"))
      .toDF("doc_id", "text")
    val got = TextQueries.charEntropyOn(df)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((1L, 0.0)))
    assert(got(2L) == ((2L, 1.0)))
    // H(2/3, 1/3) = log2(3) − 2/3 ≈ 0.918296
    assert(got(3L)._2 == 0.918296, got(3L).toString)
  }

  // ----------------------------------------------------------- q99
  test("q99: floor quotas bind per stratum, a 1-doc stratum is still represented") {
    // 301 docs: s1=200, s2=100, s3=1; T=100 → quotas 66, 33, 1.
    val rows = (1L to 200L).map(i => (i, "s1")) ++
      (201L to 300L).map(i => (i, "s2")) :+ ((301L, "s3"))
    val df = rows.toDF("doc_id", "source")
    val got = SamplingQueries.q99StratifiedSampleOn(df)
      .groupBy("source").agg(count(lit(1)).as("n"), max("quota").as("q"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("s1" -> ((66L, 66L)), "s2" -> ((33L, 33L)), "s3" -> ((1L, 1L))),
      got.toString)
    // determinism: membership is identical across runs
    val a = SamplingQueries.q99StratifiedSampleOn(df).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = SamplingQueries.q99StratifiedSampleOn(df).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  // ---------------------------------------------------------- q100
  test("q100: vocabulary rank breaks frequency ties by token; occurrences count, not types") {
    // 'w' (f=5) + r001..r150 (f=1). Top-100 = w + r001..r099 by the
    // (f DESC, tok ASC) rank. doc2 holds r051..r150: 49 in-vocab, 51 OOV.
    def r(i: Int) = f"r$i%03d"
    val doc1 = (Seq.fill(5)("w") ++ (1 to 50).map(r)).mkString(" ")
    val doc2 = (51 to 150).map(r).mkString(" ")
    val got = TextQueries.oovRateOn(Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text"))
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(got(1L) == ((55L, 0L, 0.0)), got.toString)
    assert(got(2L) == ((100L, 51L, 0.51)), got.toString)
  }

  // ---------------------------------------------------------- q101
  test("q101: per-doc mean log2 P(w2|w1) under the corpus's own bigram counts") {
    // bigrams: 'a b'×2, 'a c'×1 → P(b|a)=2/3, P(c|a)=1/3.
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val got = TextQueries.bigramLmOn(df)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(got(1L) == ((1L, -0.584963)), got.toString) // log2(2/3)
    assert(got(2L) == ((1L, -0.584963)))
    assert(got(3L) == ((1L, -1.584963))) // log2(1/3)
  }

  // ----------------------------------------------------------- q98
  test("q98: the Morton interleave puts x bits at even, y bits at odd positions") {
    val df = Seq((3, 5), (0, 0), (255, 0), (0, 255))
      .toDF("x", "y")
      .select(LayoutQueries.zValue(col("x"), col("y")).as("z"))
    val got = df.collect().map(_.getInt(0)).toSeq
    // x=3 (011), y=5 (101): 1·1 + 2·1 + 4·1 + 32·1 = 39
    // x=255 → all even bits = 0x5555; y=255 → all odd bits = 0xAAAA
    assert(got == Seq(39, 0, 0x5555, 0xAAAA), got.mkString(", "))
  }
}
