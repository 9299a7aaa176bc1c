package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 A/B probe for q_pagerank's iteration shape: CURRENT
  * (per-iteration r JOIN broadcast(deg) feeding the edges join) vs
  * DEG-ON-EDGES (deg attached to the checkpointed edge table once, so
  * each iteration is one broadcast(r) join + partial agg). Outputs
  * compared exactly; timings interleaved.
  * Usage: PrProbe <sfDir>
  */
object PrProbe {
  private def current(s: SparkSession, dir: String): DataFrame = {
    val li = graft.queries.table(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    val edges = graft.queries.RelationalQueries
      .coSupplyEdges(li, graft.queries.RelationalQueries.PrStarT)
      .localCheckpoint(false)
    val deg = edges.groupBy(col("src").as("u"))
      .agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)
    val r0 = deg.select(col("u"), lit(1000000L).as("r"))
    val rFinal = (1 to 3).foldLeft(r0) { (r, _) =>
      edges.join(broadcast(r.join(broadcast(deg), Seq("u"))
          .withColumnRenamed("u", "src")), Seq("src"))
        .select(col("dst").as("u"),
          expr("(r * 850000) DIV (1000000 * deg)").as("c"))
        .groupBy(col("u"))
        .agg((lit(150000L) + sum(col("c"))).as("r"))
    }
    deg.join(rFinal, Seq("u"))
      .select(col("u").as("suppkey"), col("deg").cast("int").as("outdeg"),
        col("r").cast("bigint").as("rank_micro"))
      .orderBy(col("suppkey"))
  }

  private def degOnEdges(s: SparkSession, dir: String): DataFrame = {
    val li = graft.queries.table(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    val edges = graft.queries.RelationalQueries
      .coSupplyEdges(li, graft.queries.RelationalQueries.PrStarT)
      .localCheckpoint(false)
    val deg = edges.groupBy(col("src").as("u"))
      .agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)
    val edgesD = edges
      .join(broadcast(deg.withColumnRenamed("u", "src")), Seq("src"))
      .localCheckpoint(false)
    val r0 = deg.select(col("u"), lit(1000000L).as("r"))
    val rFinal = (1 to 3).foldLeft(r0) { (r, _) =>
      edgesD.join(broadcast(r.withColumnRenamed("u", "src")), Seq("src"))
        .select(col("dst").as("u"),
          expr("(r * 850000) DIV (1000000 * deg)").as("c"))
        .groupBy(col("u"))
        .agg((lit(150000L) + sum(col("c"))).as("r"))
    }
    deg.join(rFinal, Seq("u"))
      .select(col("u").as("suppkey"), col("deg").cast("int").as("outdeg"),
        col("r").cast("bigint").as("rank_micro"))
      .orderBy(col("suppkey"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.head
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
    val a = current(spark, dir).collect().map(_.toString).toSeq
    val b = degOnEdges(spark, dir).collect().map(_.toString).toSeq
    println(s"[pr] $dir equal=${a == b} (n=${a.size})")
    if (a != b) sys.exit(1)
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 4).foreach { i =>
      val tA = time(current(spark, dir))
      val tB = time(degOnEdges(spark, dir))
      println(f"[pr] pass $i current=$tA%.3f degOnEdges=$tB%.3f")
    }
    spark.stop()
  }
}
