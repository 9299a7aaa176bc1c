package graft.tools

import org.apache.spark.sql.SparkSession

/** Attribution probe (optimization round): split each SparkEntry query's
  * wall time into DRIVER PLANNING (analysis + optimization + physical
  * planning, forced via `queryExecution.executedPlan`) vs EXECUTION
  * (the noop-sink write that follows, which includes the write-side
  * re-plan of the same tree — so `plan` is a lower bound on total
  * driver planning). Mirrors Bench's session confs so the split is
  * representative of the bench. One untimed warm pass per query first
  * (mirrors Bench's setup pass + reuse markers).
  * Usage: PhaseProbe <sfDir> [onlyCsv]  → one line per query:
  *   name plan_ms exec_ms
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val only = args.lift(1).map(_.split(',').map(_.trim).toSet)
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
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${256 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.entry(spark).count()
    System.setProperty("graft.reuse.tables", "true")
    val sel = graft.SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
    sel.keys.toSeq.sorted.foreach { n =>
      graft.queries.prepares.get(n).foreach(_(spark, dir))
    }
    val out = sel.keys.toSeq.sorted.map { n =>
      val fn = sel(n)
      // warm rep (untimed): builds scratch state, loads codegen classes
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"$n WARM_FAIL ${e.getMessage}") }
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      df.queryExecution.executedPlan // force analysis+optimize+plan
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      f"$n ${(t1 - t0) / 1e6}%.1f ${(t2 - t1) / 1e6}%.1f"
    }
    out.foreach(println)
    spark.stop()
  }
}
