package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 A/B probe for the mmrRerankPool rewrite: OLD k-step
  * declarative unroll (7 localCheckpoint jobs) vs NEW single-pass
  * mapPartitions greedy. Asserts bit-identical outputs for ann_mmr and
  * ann_mmr_ivf at each given SF, then interleaves timed noop runs at
  * the last SF. Usage: MmrProbe <sfDir> [<sfDir> ...]
  */
object MmrProbe {
  /** The pre-round-12 unroll, verbatim. */
  private def oldPool(candIn: DataFrame, k: Int): DataFrame = {
    graft.functions.Native.register(candIn.sparkSession)
    val wRel = Window.partitionBy(col("qid"))
      .orderBy(col("rel").desc, col("id"))
    val cand = candIn.select(col("qid"), col("id"), col("cq"), col("rel"))
      .localCheckpoint()
    val pair = cand.as("a")
      .join(cand.as("b"), col("a.qid") === col("b.qid") &&
        col("a.id") =!= col("b.id"))
      .select(col("a.qid").as("qid"), col("a.id").as("a"),
        col("b.id").as("b"),
        graft.functions.Native.cosineQ(col("a.cq"), col("b.cq"))
          .as("sim"))
      .localCheckpoint()
    var sel = cand
      .withColumn("rk", row_number().over(wRel))
      .filter(col("rk") === 1)
      .select(col("qid"), col("id"), lit(1).cast("int").as("mmr_rank"),
        col("rel"))
      .localCheckpoint()
    (2 to k).foreach { t =>
      val ms = pair
        .join(sel.select(col("qid"), col("id").as("b")), Seq("qid", "b"))
        .groupBy(col("qid"), col("a").as("id"))
        .agg(max(col("sim")).as("ms"))
      val pick = cand.join(ms, Seq("qid", "id"))
        .join(sel.select(col("qid"), col("id")), Seq("qid", "id"),
          "left_anti")
        .withColumn("score",
          lit(0.7) * col("rel") - lit(0.3) * col("ms"))
        .withColumn("rk", row_number().over(Window
          .partitionBy(col("qid"))
          .orderBy(col("score").desc, col("id"))))
        .filter(col("rk") === 1)
        .select(col("qid"), col("id"),
          lit(t).cast("int").as("mmr_rank"), col("rel"))
      sel = sel.unionByName(pick).localCheckpoint()
    }
    sel.orderBy(col("qid"), col("mmr_rank"))
  }

  private def oldMmr(s: SparkSession, dir: String): DataFrame = {
    val e = graft.queries.table(s, dir, "embeddings")
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = e.select(col("vec_id").as("id"),
      col("embedding").as("vec"))
    graft.functions.Native.register(s)
    val q = broadcast(queries.select(
      col("qid"), graft.similarity.Similarity.quantize(col("qvec")).as("qq")))
    val c = corpus.select(col("id"),
      graft.similarity.Similarity.quantize(col("vec")).as("cq"))
    val wRel = Window.partitionBy(col("qid"))
      .orderBy(col("rel").desc, col("id"))
    val cand = c.join(q, col("qid") =!= col("id"))
      .withColumn("rel",
        graft.functions.Native.cosineQ(col("qq"), col("cq")))
      .withColumn("rk", row_number().over(wRel))
      .filter(col("rk") <= 20)
      .select(col("qid"), col("id"), col("cq"), col("rel"))
    oldPool(cand, 5)
  }

  private def bits(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.toSeq.map(_.toSeq.map {
      case d: Double => java.lang.Double.doubleToRawLongBits(d).toString
      case x => String.valueOf(x)
    }.mkString("|"))

  def main(args: Array[String]): Unit = {
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
    val nwMmr = graft.SparkEntry.queries("ann_mmr")
    args.foreach { dir =>
      val a = bits(oldMmr(spark, dir).collect())
      val b = bits(nwMmr(spark, dir).collect())
      println(s"[mmr] $dir ann_mmr equal=${a == b} (n=${a.size})")
      if (a != b) {
        a.zipAll(b, "<missing>", "<missing>").filter(p => p._1 != p._2)
          .take(10).foreach { case (x, y) => println(s"  OLD $x\n  NEW $y") }
        sys.exit(1)
      }
    }
    // ann_mmr_ivf: schema comparison at the last SF only (index build is
    // per-SF scratch; the old pool path is identical — only the greedy
    // differs, and oldPool covers it via ann_mmr above). Run the NEW
    // declared query and the OLD unroll over the SAME ivf pool.
    locally {
      val dir = args.last
      val path = graft.queries.SimQueries.buildServedIvf(spark, dir)
      val pool = graft.similarity.Similarity.ivfSearchAssigned(
        spark.read.parquet(s"$path/assigned"),
        spark.read.parquet(s"$path/queries"),
        spark.read.parquet(s"$path/cents"), nprobe = 4, k = 20,
        keepVec = true)
        .select(col("qid"), col("id"), col("vq").as("cq"),
          col("cosine").as("rel"))
      val a = bits(oldPool(pool, 5).collect())
      val b = bits(graft.similarity.Similarity.mmrRerankPool(pool, 5)
        .collect())
      println(s"[mmr] $dir ann_mmr_ivf equal=${a == b} (n=${a.size})")
      if (a != b) sys.exit(1)
    }
    // interleaved timings at the last SF
    val dir = args.last
    // plan evidence for plans/r12 (the old unroll's plan is its LAST
    // step's executed plan — the checkpointed lineage hides earlier
    // jobs, so the honest "before" evidence is the job COUNT measured
    // below plus this final-step plan)
    locally {
      import java.nio.file.{Files, Paths}
      val fm = org.apache.spark.sql.execution.FormattedMode
      Files.createDirectories(Paths.get("/root/repo/plans/r12"))
      Files.writeString(
        Paths.get("/root/repo/plans/r12/ann_mmr_before.txt"),
        oldMmr(spark, dir).queryExecution.explainString(fm))
      Files.writeString(
        Paths.get("/root/repo/plans/r12/ann_mmr_after.txt"),
        nwMmr(spark, dir).queryExecution.explainString(fm))
    }
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 4).foreach { i =>
      val tOld = time(oldMmr(spark, dir))
      val tNew = time(nwMmr(spark, dir))
      println(f"[mmr] pass $i ann_mmr old=$tOld%.3f new=$tNew%.3f")
    }
    // job-count evidence: the rewrite's point is barrier removal
    locally {
      val counter = new java.util.concurrent.atomic.AtomicInteger
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          counter.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      def jobs(f: => DataFrame): Int = {
        counter.set(0)
        f.write.format("noop").mode("overwrite").save()
        org.apache.spark.graftbridge.ListenerFlush(spark.sparkContext)
        counter.get()
      }
      println(s"[mmr] jobs old=${jobs(oldMmr(spark, dir))} " +
        s"new=${jobs(nwMmr(spark, dir))}")
      spark.sparkContext.removeSparkListener(l)
    }
    spark.stop()
  }
}
