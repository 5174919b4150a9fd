package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    queries("q33_candidate_selection")(spark, dir)
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
    graft.queries.TextQueries.queries ++
    graft.queries.MatchQueries.queries ++
    graft.queries.FeatureQueries.queries ++
    graft.queries.DataQueries.queries ++
    graft.queries.MlQueries.queries ++
    graft.queries.SourceStreamQueries.queries ++
    graft.queries.CorpusQueries.queries ++
    graft.queries.RankQueries.queries

  /** What [[Bench]] measures: the correctness queries, with the entries whose
    * correctness form embeds in-query oracle verification replaced by their
    * production configuration (see DataQueries.benchOverrides).
    */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    queries ++ graft.queries.DataQueries.benchOverrides ++
      graft.queries.MlQueries.benchOverrides ++
      graft.queries.SourceStreamQueries.benchOverrides

  /** Queries deliberately shipped WITHOUT an oracleSql entry (driver
    * falls back to the weaker rows>0 check). Every member needs a
    * written justification here; [[InventorySpec]] fails on any
    * registry key that is in neither oracleSql nor this set, so a
    * forgotten oracle can never ship silently. Currently empty: all
    * registered queries carry a DuckDB oracle.
    */
  val rowsOnlyWaived: Set[String] = Set.empty

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracleSql ++
    graft.queries.TextQueries.oracleSql ++
    graft.queries.MatchQueries.oracleSql ++
    graft.queries.FeatureQueries.oracleSql ++
    graft.queries.DataQueries.oracleSql ++
    graft.queries.MlQueries.oracleSql ++
    graft.queries.SourceStreamQueries.oracleSql ++
    graft.queries.CorpusQueries.oracleSql ++
    graft.queries.RankQueries.oracleSql
}
