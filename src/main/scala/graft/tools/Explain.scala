package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: print the formatted physical plan of named
  * SparkEntry queries without executing them.
  * Usage: graft.tools.Explain <sfDir> <query>[,<query>...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(dir, names) = args
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    names.split(',').foreach { q =>
      println(s"===== $q =====")
      println(graft.SparkEntry.queries(q)(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
