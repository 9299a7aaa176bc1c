package graft.queries

import org.apache.spark.sql.functions._
import graft.udf.Udfs

/** UDF-surface queries (SURVEY.md §2j): both the scalar UDF and the
  * typed Aggregator are deterministic by construction (integer-cent
  * accumulation), so even user-extension code stays oracle-checkable.
  */
object UdfQueries {

  val defs: Map[String, Q] = checked(
    "q_udf_scalar" -> { (s, dir) =>
      table(s, dir, "orders")
        .select(col("o_orderkey"),
          Udfs.strPrefix(col("o_orderpriority"), lit(1)).as("prio_prefix"))
        .groupBy(col("prio_prefix"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("prio_prefix"))
    },
    "q_udaf_wavg" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(Udfs.weightedAvg(col("l_extendedprice"), col("l_quantity"))
          .as("wavg_price"))
        .orderBy(col("l_returnflag"))
    }
  )

  val oracles: Map[String, String] = checked(
    "q_udf_scalar" ->
      """SELECT substring(o_orderpriority, 1, 1) AS prio_prefix, COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY prio_prefix""".stripMargin,
    "q_udaf_wavg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
        |           * CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
        |    / (100.0 * SUM(CAST(round(l_quantity) AS BIGINT))) AS wavg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
