package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-12 probe for the r11 driver-window spikes (VERDICT "What's
  * wrong" #3): same-session interleaved preferSortMergeJoin on/off at
  * full width over the three spiking queries, to attribute the driver's
  * q_tpch_q10 7.5-8.5 s readings to host contention vs an SHJ/32-part
  * interaction. Usage: ShjProbe <sfDir> [passes]
  */
object ShjProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val passes = args.lift(1).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${256 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("q_tpch_q10", "q_profile_numeric", "ann_topk_sql")
    // ann_topk_sql needs its served-index scratch
    names.foreach(n => graft.queries.prepares.get(n)
      .foreach(p => p(spark, dir)))
    System.setProperty("graft.reuse.tables", "true")
    def time(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(time) // warm
    (1 to passes).foreach { i =>
      Seq("false", "true").foreach { pref =>
        spark.conf.set("spark.sql.join.preferSortMergeJoin", pref)
        val label = if (pref == "false") "shj" else "smj"
        val ts = names.map(n => f"$n=${time(n)}%.3f")
        println(s"[shj] pass $i $label ${ts.mkString(" ")}")
      }
    }
    spark.stop()
  }
}
