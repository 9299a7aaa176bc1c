package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print the executed physical plan of named queries at a
  * given sf dir — the quick feedback loop behind PLANS.md audits and
  * PlanGuardSpec pins. Usage: PlanDump <sfDir> <name> [<name> ...] */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { n =>
      println(s"===== $n =====")
      println(graft.SparkEntry.queries(n)(spark, dir)
        .queryExecution.executedPlan.treeString)
    }
    spark.stop()
  }
}
