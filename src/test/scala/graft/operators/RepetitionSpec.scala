package graft.operators

import graft.SparkSpec

/** Hand-computed semantics for the Gopher intra-doc repetition filters
  * (q176): exact top-bigram char fraction with deterministic tie-break,
  * exact duplicated-10-gram position fraction, the keep thresholds, and
  * the short-document edge cases.
  */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("q176 metrics match hand computation; degenerate docs are rejected") {
    // doc 1: "x y" * 8 — top bigram "x y" occurs 8 times (positions
    //   1,3,5,... AND the overlapping "y x" occurs 7) — counts: "x y"=8,
    //   "y x"=7 → top is "x y" (8 × 3 chars) / 31 chars = 24/31 ≈ 0.774.
    //   16 words → 7 ten-gram positions, ALL duplicated (the text is
    //   periodic with period 2 < 10) → dup10 = 1.0. Rejected.
    // doc 2: 12 distinct words — every bigram unique (count 1, tie
    //   broken to the alphabetically-first bigram), no duplicated
    //   10-gram → kept.
    // doc 3: one word — no bigram, no 10-gram: both fractions 0, kept.
    val docs = Seq(
      (1L, Array.fill(8)("x y").mkString(" ")),
      (2L, "a b c d e f g h i j k l"),
      (3L, "solo")).toDF("doc_id", "text")
    val got = RepetitionQueries.repetitionOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4))).toMap

    val (n1, t1, d1, k1) = got(1L)
    assert(n1 == 16L)
    assert(math.abs(t1 - 24.0 / 31.0) < 1e-12, s"top2 $t1")
    assert(d1 == 1.0, s"dup10 $d1")
    assert(!k1, "a period-2 degenerate doc must be rejected")

    val (n2, t2, d2, k2) = got(2L)
    assert(n2 == 12L)
    assert(math.abs(t2 - 3.0 / 23.0) < 1e-12, s"unique-bigram doc top2 $t2")
    assert(d2 == 0.0 && k2)

    assert(got(3L) == ((1L, 0.0, 0.0, true)))
  }

  test("top2_frac caps at 1.0 when overlapping occurrences over-cover the text") {
    // "z z z z z z": bigram "z z" occurs 5 times × 3 chars = 15 > 11
    // chars — the raw ratio exceeds 1, the metric must cap.
    val docs = Seq((1L, "z z z z z z")).toDF("doc_id", "text")
    val r = RepetitionQueries.repetitionOn(docs).collect().head
    assert(r.getDouble(2) == 1.0)
    assert(!r.getBoolean(4))
  }

  test("streaming gate verdicts are bit-identical to batch q176 (sf0.001 + stream smoke)") {
    // batch parity on the real corpus: same metrics, same tie-breaks,
    // same doubles — not approximately, exactly
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    def asMap(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_words", "top2_frac", "dup10_frac", "keep")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4))).toMap
    val batch = asMap(RepetitionQueries.q176GopherRepetition(spark, "/root/testdata/sf0.001"))
    val gated = asMap(graft.streaming.RepetitionGate.gate(docs))
    assert(gated == batch, "gate and batch face must agree on every document")

    // and the gate runs as an actual append-mode stream (stateless)
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val out = graft.streaming.RepetitionGate.gate(
      input.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("rep_gate_out")
      .outputMode("append").start()
    try {
      input.addData((1L, Array.fill(8)("x y").mkString(" ")), (2L, "a b c d e f g h i j k l"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("rep_gate_out")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(streamed == Map(1L -> false, 2L -> true))
  }

  test("real corpus: fractions are in [0,1] and both regimes occur (sf0.001)") {
    val rows = RepetitionQueries.q176GopherRepetition(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    val kept = rows.count(_.getBoolean(4))
    assert(kept > 0 && kept < rows.length,
      s"the synthetic corpus should split ($kept/${rows.length} kept)")
  }
}
