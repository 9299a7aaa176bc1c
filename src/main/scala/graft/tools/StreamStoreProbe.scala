package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-12 floor probe for the streaming family (VERDICT item 6): the
  * stateful queries A/B'd between the default (HDFS-backed in-memory)
  * state store provider and RocksDB, interleaved in one session.
  * Usage: StreamStoreProbe <sfDir> [passes]
  */
object StreamStoreProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
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
    val names = Seq("stream_counter", "stream_dedup", "stream_sessionize",
      "stream_session_timeout", "stream_running_stats", "stream_join",
      "stream_matview")
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
    val providers = Seq(
      ("default", "org.apache.spark.sql.execution.streaming.state." +
        "HDFSBackedStateStoreProvider"),
      ("rocksdb", "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider"))
    (1 to passes).foreach { i =>
      providers.foreach { case (label, cls) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", cls)
        val ts = names.map(n => f"$n=${time(n)}%.2f")
        println(s"[sstore] pass $i $label ${ts.mkString(" ")}")
      }
    }
    spark.stop()
  }
}
