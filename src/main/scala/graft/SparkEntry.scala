package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{AsOfJoin, AuditQueries, BpeQueries, ChangeDataQueries, ClassifierQueries, CoreQueries, CorpusQueries, CurationQueries, DedupQueries, FunnelQueries, GraphQueries, LayoutQueries, MediaQueries, MixtureQueries, RangeJoin, RepetitionQueries, RelationalExtras, SamplingQueries, SessionQueries, SimilarityQueries, SubstringDedup, TemporalQueries, TextQueries, TokenizerCompare, UnigramQueries, WordPieceQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The dashboard's per-minute tumbling-window aggregation — the query the
    * reference's whole lake layout exists to serve (SURVEY §3.3). */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q03WindowAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.all ++ DedupQueries.all ++ SimilarityQueries.all ++
      TextQueries.all ++ AsOfJoin.all ++ RangeJoin.all ++ SessionQueries.all ++
      RelationalExtras.all ++ SamplingQueries.all ++ CorpusQueries.all ++
      CurationQueries.all ++ FunnelQueries.all ++ ChangeDataQueries.all ++
      TemporalQueries.all ++ LayoutQueries.all ++ AuditQueries.all ++
      GraphQueries.all ++ BpeQueries.all ++ ClassifierQueries.all ++
      SubstringDedup.all ++ MediaQueries.all ++ UnigramQueries.all ++
      WordPieceQueries.all ++ TokenizerCompare.all ++ MixtureQueries.all ++ RepetitionQueries.all ++
      Map("q38_quality_checks" ->
        ((s: SparkSession, d: String) => graft.analytics.DataQuality.q38QualityChecks(s, d)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ DedupQueries.oracles ++ SimilarityQueries.oracles ++
      TextQueries.oracles ++ AsOfJoin.oracles ++ RangeJoin.oracles ++
      SessionQueries.oracles ++ RelationalExtras.oracles ++ SamplingQueries.oracles ++
      CorpusQueries.oracles ++ CurationQueries.oracles ++ FunnelQueries.oracles ++
      ChangeDataQueries.oracles ++ TemporalQueries.oracles ++ LayoutQueries.oracles ++
      AuditQueries.oracles ++ GraphQueries.oracles ++ ClassifierQueries.oracles ++
      SubstringDedup.oracles ++ MediaQueries.oracles ++ MixtureQueries.oracles ++ RepetitionQueries.oracles ++
      Map("q38_quality_checks" -> graft.analytics.DataQuality.q38Sql)
}
