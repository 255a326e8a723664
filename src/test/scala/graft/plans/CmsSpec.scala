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
}
