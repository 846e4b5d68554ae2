package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the large-scale
  * training-data-pipeline extensions) is exposed as a named query over the
  * driver's parquet testdata, with a DuckDB oracle where the semantics are
  * SQL-expressible. Aggregation of doubles is done in scaled-integer space
  * on both sides so the driver's hash compare is exact (see
  * operators.TimeSeriesOps scaladoc). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the star-schema revenue rollup (joins + broadcast + exact agg). */
  def entry(spark: SparkSession): DataFrame =
    queries("rel_star_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TimeSeriesQueries.defs ++ RelationalQueries.defs ++ LlmQueries.defs ++
      StreamingQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    TimeSeriesQueries.oracles ++ RelationalQueries.oracles ++
      LlmQueries.oracles ++ StreamingQueries.oracles
}
