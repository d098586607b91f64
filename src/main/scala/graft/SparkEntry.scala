package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared query from SURVEY.md §2 appears in [[queries]]; the
  * SQL-expressible ones carry a DuckDB oracle in [[oracleSql]] with
  * column names aligned to the Spark result. Conventions (FIXTURES.md):
  * deterministic total ordering, UTC, `round(x, 4)` on computed double
  * aggregates, passthrough columns left untouched (bit-exact).
  *
  * Round 8: the catalog itself lives in per-domain objects
  * ([[CoreQueries]], [[RelationalQueries]], [[TextQueries]],
  * [[EmbeddingQueries]], [[MultimodalQueries]], [[AnalyticsQueries]],
  * [[StreamingQueries]]) sharing [[EntryHelpers]]; this object merges
  * them — the driver contract and every query name are unchanged.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_group_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ RelationalQueries.queries ++ TextQueries.queries ++
      EmbeddingQueries.queries ++ MultimodalQueries.queries ++
      AnalyticsQueries.queries ++ StreamingQueries.queries

  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ RelationalQueries.oracles ++ TextQueries.oracles ++
      EmbeddingQueries.oracles ++ MultimodalQueries.oracles ++
      AnalyticsQueries.oracles ++ StreamingQueries.oracles
}
