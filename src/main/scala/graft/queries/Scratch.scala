package graft.queries
// scratch: dump BEFORE-plans for the cube/rollup rewrite

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dec = DecimalType(18, 2)
    val cube = spark.read.parquet(s"$dir/lineitem.parquet")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(dec)).cast("double").as("qty"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), asc_nulls_first("l_returnflag"),
        asc_nulls_first("l_linestatus"))
    val rollup = spark.read.parquet(s"$dir/customer.parquet")
      .rollup(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("c_acctbal").cast(dec)).cast("double").as("total_bal"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), asc_nulls_first("c_mktsegment"),
        asc_nulls_first("c_nationkey"))
    println("===== q_cube =====")
    println(cube.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    println("===== q_rollup =====")
    println(rollup.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
