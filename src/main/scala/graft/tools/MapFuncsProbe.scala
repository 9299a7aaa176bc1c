package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 probe for q_map_funcs: the status filter is spelled
  * `element_at(m, 'status') === 'O'` over the constructed map, which
  * the generator barrier hides from pushdown — the scan reads every
  * order row. Variant `push` replaces the filter predicate with the
  * provably-equal raw-column spelling (the map's 'status' entry IS
  * o_orderstatus, null-for-null) so PushedFilters reaches the scan;
  * everything above the filter is untouched.
  * Usage: MapFuncsProbe <sfDir> [eq|time|plan]
  */
object MapFuncsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val mode = args.lift(1).getOrElse("time")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${256 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def build(pushdown: Boolean): DataFrame = {
      import graft.ops.Ops.materializedColumn
      val m = map_concat(
        map_from_arrays(array(lit("status"), lit("prio")),
          array(col("o_orderstatus"), col("o_orderpriority"))),
        map(lit("cust"), col("o_custkey").cast("string")))
      val base = materializedColumn(
        graft.queries.table(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_orderpriority"), col("o_custkey")),
        "m", m)
      val filtered =
        if (pushdown) base.filter(col("o_orderstatus") === "O")
        else base.filter(element_at(col("m"), "status") === "O")
      filtered
        .orderBy(col("o_orderkey"))
        .select(col("o_orderkey"),
          element_at(col("m"), "prio").as("prio"),
          size(map_filter(col("m"), (_, v) => length(v) > lit(9)))
            .cast("long").as("n_long_vals"),
          array_join(sort_array(map_keys(col("m"))), "|").as("keys_csv"),
          array_join(sort_array(map_values(col("m"))), "|").as("vals_csv"))
    }

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    mode match {
      case "eq" =>
        val a = build(false).collect().toSeq.map(_.toString)
        val b = build(true).collect().toSeq.map(_.toString)
        println(s"[mapf] $dir equal=${a == b} (n=${a.size})")
        println(s"[mapf] schemaEqual=${
          build(false).schema.toString == build(true).schema.toString}")
      case "plan" =>
        println("===== q_map_funcs BEFORE =====")
        println(build(false).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        println("===== q_map_funcs AFTER =====")
        println(build(true).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      case _ =>
        (1 to 4).foreach { i =>
          val tOld = time(build(false))
          val tNew = time(build(true))
          println(f"[mapf] pass $i old=$tOld%.3f new=$tNew%.3f")
        }
    }
    spark.stop()
  }
}
