package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2.0/§7.
  *
  * `queries` keys follow SURVEY.md §2's declared inventory exactly; every
  * oracle-checked entry has matching column names and a terminal ORDER BY
  * in both the Spark plan and the DuckDB SQL (the driver sorts columns by
  * name and hash-compares values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (batch only —
    * Bench calls .count() on every entry; streaming lives in
    * [[graft.streaming]]).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ScansEtl.queries ++ Filters.queries ++ OffsetBounds.queries ++
      Projections.queries ++ Joins.queries ++ Aggregations.queries ++
      Windows.queries ++ SortsSets.queries ++ Subqueries.queries ++
      LlmOps.queries ++ Pipeline.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approx/hash-seeded sketches) → driver records a rows-only check.
    */
  def oracleSql: Map[String, String] =
    ScansEtl.oracle ++ Filters.oracle ++ OffsetBounds.oracle ++
      Projections.oracle ++ Joins.oracle ++ Aggregations.oracle ++
      Windows.oracle ++ SortsSets.oracle ++ Subqueries.oracle ++
      LlmOps.oracle ++ Pipeline.oracle
}
