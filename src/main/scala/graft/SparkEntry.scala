package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries and oracles live next to the operator modules they exercise
  * (graft.operators.*, graft.dedup.*, graft.similarity.*, ...); this
  * object only concatenates their maps for the driver harness.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] =
    operators.Relational.queries ++ operators.Snapshots.queries ++
      operators.TimeSeries.queries ++ operators.TextAnalysis.queries ++
      dedup.Dedup.queries ++ similarity.Similarity.queries ++
      multimodal.Multimodal.queries ++ operators.Analytics.queries ++
      operators.Scale.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++ operators.Snapshots.oracles ++
      operators.TimeSeries.oracles ++ operators.TextAnalysis.oracles ++
      dedup.Dedup.oracles ++ similarity.Similarity.oracles ++
      multimodal.Multimodal.oracles ++ operators.Analytics.oracles ++
      operators.Scale.oracles
}
