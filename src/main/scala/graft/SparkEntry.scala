package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Note on `events.ts`: the driver's testdata stores microsecond
  * parquet timestamps (no timezone), which Spark reads as
  * TIMESTAMP_NTZ. Queries normalize with `cast(ts as timestamp)`
  * (a wall-clock-preserving NTZ→LTZ cast under the UTC sessions
  * Verify/Bench build), matching DuckDB's `CAST(ts AS TIMESTAMP)`.
  * Earlier testdata generations stored nanos-as-long; the
  * `nanosAsLong` session conf is kept in Verify/Bench so either
  * generation stays readable.
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
