package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each entry in [[queries]] is one implemented operator from SURVEY §2 /
  * the training-data surface; [[oracleSql]] holds the DuckDB-equivalent SQL
  * for the driver's hash compare (same column names, same total order). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AnalyticsQueries.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    FloQueries.queries ++ AnalyticsQueries.queries ++ TpchQueries.queries ++
      ScalarQueries.queries ++
      DedupQueries.queries ++ SimilarityQueries.queries ++ TextQueries.queries ++
      MultimodalQueries.queries ++ PipelineQueries.queries

  def oracleSql: Map[String, String] =
    FloQueries.oracles ++ AnalyticsQueries.oracles ++ TpchQueries.oracles ++
      ScalarQueries.oracles ++
      DedupQueries.oracles ++ SimilarityQueries.oracles ++ TextQueries.oracles ++
      MultimodalQueries.oracles ++ PipelineQueries.oracles
}
