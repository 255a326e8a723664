package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextQueries

/** Count-Min sketch guarantees against exact counts — the pins that
  * stand in for a SQL oracle (q129 is rows-only: DuckDB can't reproduce
  * Murmur buckets): exactness below the collision regime, the one-sided
  * error everywhere, the ε-bound, and merge-tree invariance (the
  * property that makes the sketch safe as a partial aggregate).
  */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  private val tokens: Seq[String] =
    Seq.tabulate(2000)(i => s"t${i % 97}") ++ Seq.fill(300)("hot") ++
      Seq.tabulate(100)(i => s"rare$i")

  private def exact: Map[String, Long] =
    tokens.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }

  private def estimates(depth: Int, width: Int, partitions: Int): Map[String, Long] = {
    val df = tokens.toDF("tok").repartition(partitions)
    val sk = df.agg(CountMin.sketch(col("tok"), depth, width).as("sk"))
    val keys = exact.keys.toSeq.toDF("tok")
    sk.crossJoin(keys)
      .select(col("tok"), CountMin.estimateCol(col("sk"), col("tok"), depth, width).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("wide sketch (no collisions) reproduces exact counts") {
    // 198 distinct tokens, width 4096: collision-free in every row with
    // overwhelming probability for THIS fixed token set (deterministic —
    // Murmur seeds are fixed; the assertion proves it holds).
    val est = estimates(4, 4096, 5)
    exact.foreach { case (t, c) => assert(est(t) == c, s"$t: ${est(t)} != $c") }
  }

  test("narrow sketch only ever overestimates, within 2n/width for the probed keys") {
    val est = estimates(4, 64, 5)
    val n = tokens.length
    val bound = 2.0 * n / 64
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"$t underestimated: ${est(t)} < $c")
      assert(est(t) <= c + bound, s"$t error ${est(t) - c} > $bound")
    }
  }

  test("merge tree is irrelevant: 1-partition and 13-partition sketches are identical") {
    def counters(partitions: Int): Seq[Long] =
      tokens.toDF("tok").repartition(partitions)
        .agg(CountMin.sketch(col("tok"), 4, 64).as("sk"))
        .collect().head.getSeq[Long](0)
    assert(counters(1) == counters(13))
  }

  test("nulls are skipped, not counted") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("tok")
    val est = df.agg(CountMin.sketch(col("tok"), 4, 64).as("sk"))
      .select(CountMin.estimateCol(col("sk"), lit("a"), 4, 64))
      .collect().head.getLong(0)
    assert(est == 2L)
  }

  test("q129: every per-lang estimate dominates the exact per-lang count") {
    val docs = Seq(
      (1L, "the cat sat on the mat", "en"), (2L, "the dog ate the bone", "en"),
      (3L, "le chat et le chien", "fr"), (4L, "der hund und die katze", "de"),
      (5L, "the the the rare", "en"))
      .toDF("doc_id", "text", "lang")
    val got = TextQueries.cmsFreqOn(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    graft.core.Caches.releaseAll()
    val exactPerLang = docs.collect().flatMap { r =>
      r.getString(1).split(" ").map(t => (r.getString(2), t))
    }.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    // 10 probe tokens x 3 langs
    assert(got.size == 30, got.size.toString)
    got.foreach { case ((lang, tok), est) =>
      assert(est >= exactPerLang.getOrElse((lang, tok), 0L),
        s"($lang,$tok) est $est under exact")
    }
    // the dominant probe token is exact in the tiny-vocab regime
    assert(got(("en", "the")) == exactPerLang(("en", "the")))
  }

  // ------------------------------------------------ join-size estimate
  private def sketchOf(keys: Seq[String], depth: Int, width: Int) =
    keys.toDF("k").agg(CountMin.sketch(col("k"), depth, width).as("sk"))

  test("cms_join_est dominates the true join size and stays within the inner-product slack") {
    // A: k0..k99 once each; B: k0..k49 twice each → true equi-join
    // size = 50·1·2 = 100. Collisions only ADD products, so the row-min
    // is ≥ 100; expected slack per row is n1·n2/width ≈ 39.
    val a = sketchOf(Seq.tabulate(100)(i => s"k$i"), 4, 256)
    val b = sketchOf(Seq.tabulate(100)(i => s"k${i % 50}"), 4, 256)
    val est = a.crossJoin(b.withColumnRenamed("sk", "sk2"))
      .select(CountMin.joinSizeCol(col("sk"), col("sk2"), 4, 256).as("est"))
      .collect().head.getLong(0)
    assert(est >= 100L, s"inner product must dominate the truth: $est")
    assert(est <= 100L + 4 * 100L * 100L / 256, s"slack blown: $est")
    // disjoint key sets: truth 0, the row-min stays near it
    val c = sketchOf(Seq.tabulate(50)(i => s"x$i"), 4, 256)
    val d = sketchOf(Seq.tabulate(50)(i => s"y$i"), 4, 256)
    val z = c.crossJoin(d.withColumnRenamed("sk", "sk2"))
      .select(CountMin.joinSizeCol(col("sk"), col("sk2"), 4, 256).as("est"))
      .collect().head.getLong(0)
    assert(z <= 50L, s"disjoint sketches must estimate near zero: $z")
  }

  test("probing with mismatched geometry fails loud, not with wrong offsets") {
    // A sketch built 4x256 probed with 4x512 literals would read wrong
    // offsets (or throw an opaque AIOOBE inside generated code) — the
    // kernels must instead name the mismatch.
    val sk = sketchOf(Seq("a", "b", "c"), 4, 256)
    val e = intercept[Exception] {
      sk.select(CountMin.estimateCol(col("sk"), lit("a"), 4, 512)).collect()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ rootMessages(x.getCause))
    assert(rootMessages(e).exists(_.contains("geometry mismatch")),
      s"want a clear geometry error, got: ${e.getMessage}")
    val e2 = intercept[Exception] {
      sk.crossJoin(sketchOf(Seq("x"), 8, 256).withColumnRenamed("sk", "sk2"))
        .select(CountMin.joinSizeCol(col("sk"), col("sk2"), 4, 256)).collect()
    }
    assert(rootMessages(e2).exists(_.contains("geometry mismatch")),
      s"want a clear geometry error, got: ${e2.getMessage}")
  }

  test("cms_join_est collision-free regime is exact") {
    // truth: 10 shared users × 3 × 4 = 120; width 512 over 30 distinct
    // keys is collision-free for this fixed key set → exact.
    val a = sketchOf(Seq.tabulate(60)(i => s"u${i % 20}"), 4, 512)
    val b = sketchOf(Seq.tabulate(40)(i => s"u${i % 10}"), 4, 512)
    val est = a.crossJoin(b.withColumnRenamed("sk", "sk2"))
      .select(CountMin.joinSizeCol(col("sk"), col("sk2"), 4, 512).as("est"))
      .collect().head.getLong(0)
    assert(est == 120L, s"$est")
  }
}
