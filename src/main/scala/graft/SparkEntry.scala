package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Session requirement: the driver's testdata `events` table stores
  * nanosecond parquet timestamps, which Spark only reads with
  * `spark.sql.legacy.parquet.nanosAsLong=true` (set in Verify/Bench; any
  * external session running these queries needs it too). Queries convert
  * with `timestamp_micros(ts DIV 1000)`, matching DuckDB's
  * `CAST(ts AS TIMESTAMP)` truncation.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.defs("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    KvQueries.defs ++ RelationalQueries.defs ++ RelationalQueries.defs2 ++
      TpchQueries.defs ++ TextQueries.defs ++ DedupQueries.defs ++
      SimQueries.defs ++ MmQueries.defs ++ UdfQueries.defs ++
      StreamQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    KvQueries.oracles ++ RelationalQueries.oracles ++ RelationalQueries.oracles2 ++
      TpchQueries.oracles ++ TextQueries.oracles ++ DedupQueries.oracles ++
      SimQueries.oracles ++ MmQueries.oracles ++ UdfQueries.oracles ++
      StreamQueries.oracles
}
