package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every query surface of the engine:
  *   - `analytics.Queries`: relational surface (SURVEY §2.8)
  * Each query has a DuckDB oracle in [[oracleSql]] unless the operator is
  * not SQL-expressible (then it gets a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    analytics.Queries.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    analytics.Queries.queries ++
      ext.Dedup.queries ++ ext.Similarity.queries ++
      ext.TextAnalysis.queries ++ ext.Multimodal.queries ++
      ext.Curation.queries ++ ext.Retrieval.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    analytics.Queries.oracles ++
      ext.Dedup.oracles ++ ext.Similarity.oracles ++
      ext.TextAnalysis.oracles ++ ext.Multimodal.oracles ++
      ext.Curation.oracles ++ ext.Retrieval.oracles
}
