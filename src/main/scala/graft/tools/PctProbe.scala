package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 A/B probe for the q_percentile_approx rewrite: the OLD
  * one-aggregate form (exact `percentile` over raw rows) vs the NEW
  * frequency-domain form in SparkEntry. Asserts bit-identical outputs
  * (doubleToRawLongBits on every double) at each given SF, then
  * interleaves timed noop-sink runs at the last SF.
  * Usage: PctProbe <sfDir> [<sfDir> ...]
  */
object PctProbe {
  private def old(s: SparkSession, dir: String): DataFrame = {
    graft.queries.table(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_quantity, array(0.25, 0.5, 0.75), 2500)")
          .as("aq"),
        expr("percentile(l_quantity, array(0.25, 0.5, 0.75))").as("eq"),
        expr("approx_percentile(l_extendedprice, 0.99, 2500)").as("ap99"),
        expr("percentile(floor(l_extendedprice), 0.99)").as("ep99"))
      .select(col("l_returnflag"),
        element_at(col("eq"), 1).as("p25_qty"),
        element_at(col("eq"), 2).as("med_qty"),
        element_at(col("eq"), 3).as("p75_qty"),
        col("ep99").as("p99_price"),
        (abs(element_at(col("aq"), 2).cast("double") -
          element_at(col("eq"), 2)) <= lit(1.0)).as("med_in_band"),
        (abs(element_at(col("aq"), 1).cast("double") -
          element_at(col("eq"), 1)) <= lit(1.0) &&
         abs(element_at(col("aq"), 3).cast("double") -
          element_at(col("eq"), 3)) <= lit(1.0)).as("quartiles_in_band"),
        (abs(col("ap99").cast("double") - col("ep99")) <=
          greatest(lit(1.0), col("ep99") * 0.02)).as("p99_in_band"))
      .orderBy(col("l_returnflag"))
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
    val nw = graft.SparkEntry.queries("q_percentile_approx")
    args.foreach { dir =>
      val a = bits(old(spark, dir).collect())
      val b = bits(nw(spark, dir).collect())
      val ok = a == b
      println(s"[pct] $dir equal=$ok")
      if (!ok) {
        a.zipAll(b, "<missing>", "<missing>").foreach { case (x, y) =>
          if (x != y) println(s"  OLD $x\n  NEW $y")
        }
        sys.exit(1)
      }
    }
    // interleaved timings at the last SF
    val dir = args.last
    // plan evidence for plans/r12
    locally {
      import java.nio.file.{Files, Paths}
      val fm = org.apache.spark.sql.execution.FormattedMode
      Files.createDirectories(Paths.get("/root/repo/plans/r12"))
      Files.writeString(
        Paths.get("/root/repo/plans/r12/q_percentile_approx_before.txt"),
        old(spark, dir).queryExecution.explainString(fm))
      Files.writeString(
        Paths.get("/root/repo/plans/r12/q_percentile_approx_after.txt"),
        nw(spark, dir).queryExecution.explainString(fm))
    }
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 4).foreach { i =>
      val tOld = time(old(spark, dir))
      val tNew = time(nw(spark, dir))
      println(f"[pct] pass $i old=$tOld%.3f new=$tNew%.3f")
    }
    // decomposition of the new form's subplans
    locally {
      val base = graft.queries.table(spark, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"))
      def sketch = base.groupBy(col("l_returnflag"))
        .agg(
          expr("approx_percentile(l_quantity, array(0.25,0.5,0.75), 2500)")
            .as("aq"),
          expr("approx_percentile(l_extendedprice, 0.99, 2500)").as("ap99"))
      def qtyEq = base.filter(col("l_quantity").isNotNull)
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, array(0.25,0.5,0.75), cnt)")
          .as("eq"))
      def priceF = base.filter(col("l_extendedprice").isNotNull)
        .groupBy(col("l_returnflag"),
          expr("floor(l_extendedprice)").as("v"))
        .agg(count(lit(1)).as("cnt"))
      (1 to 3).foreach { i =>
        val t1 = time(sketch)
        val t2 = time(qtyEq)
        val t3 = time(priceF)
        println(f"[pct] parts pass $i sketch=$t1%.3f qtyEq=$t2%.3f priceF=$t3%.3f")
      }
      // concurrency check (§2.6): the three parts as concurrent jobs
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val ts = Seq(() => sketch, () => qtyEq, () => priceF).map { f =>
          val th = new Thread(() =>
            f().write.format("noop").mode("overwrite").save())
          th.start(); th
        }
        ts.foreach(_.join())
        println(f"[pct] concurrent pass $i wall=${(System.nanoTime()-t0)/1e9}%.3f")
      }
    }
    spark.stop()
  }
}
