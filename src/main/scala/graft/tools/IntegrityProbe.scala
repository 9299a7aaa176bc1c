package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 probe for q_integrity: the current shape runs SEVEN
  * independent (groupBy child key -> full join parent keys -> 1-row
  * agg) branches and unions the 7 rows — 7 joins / ~21 exchanges of
  * fixed cost. The candidate tags each edge's child keys and parent
  * keys with the edge label, unions them, and runs ONE
  * groupBy(edge, k) -> ONE full join -> ONE groupBy(edge) aggregate:
  * identical per-edge arithmetic (the composite key keeps edges
  * disjoint), same shuffle bytes, 1/7th the stages. Also reads
  * lineitem once instead of three times. Usage:
  * IntegrityProbe <sfDir> [eq|time|plan]
  */
object IntegrityProbe {
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

    def t(n: String) = graft.queries.table(spark, dir, n)

    // pre-rewrite declared shape, verbatim
    def oldIntegrity: DataFrame = {
      def edge(name: String, child: DataFrame, ck: String,
               parent: DataFrame, pk: String) = {
        val keys = child.groupBy(col(ck).as("k"))
          .agg(count(lit(1)).as("rows"))
        val pkeys = parent.select(col(pk).as("pk"))
        keys.join(pkeys, col("k") === col("pk"), "full")
          .agg(
            coalesce(sum(col("rows")), lit(0L)).cast("long")
              .as("n_child_rows"),
            count(when(col("rows").isNotNull, 1)).as("n_child_keys"),
            count(when(col("rows").isNotNull && col("pk").isNull, 1))
              .as("orphan_keys"),
            coalesce(sum(when(col("pk").isNull, col("rows"))), lit(0L))
              .cast("long").as("orphan_rows"),
            count(when(col("rows").isNull, 1)).as("childless_parents"))
          .select(lit(name).as("edge"), col("n_child_rows"),
            col("n_child_keys"), col("orphan_keys"), col("orphan_rows"),
            col("childless_parents"))
      }
      val li = t("lineitem"); val o = t("orders")
      val c = t("customer"); val su = t("supplier")
      val p = t("part"); val n = t("nation"); val r = t("region")
      Seq(
        edge("customer.c_nationkey->nation", c, "c_nationkey", n, "n_nationkey"),
        edge("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
        edge("lineitem.l_partkey->part", li, "l_partkey", p, "p_partkey"),
        edge("lineitem.l_suppkey->supplier", li, "l_suppkey", su, "s_suppkey"),
        edge("nation.n_regionkey->region", n, "n_regionkey", r, "r_regionkey"),
        edge("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey"),
        edge("supplier.s_nationkey->nation", su, "s_nationkey", n, "n_nationkey"))
        .reduce(_ unionByName _)
        .orderBy(col("edge"))
    }

    // candidate: tag + union + one join + one grouped aggregate
    def newIntegrity: DataFrame = {
      val li = t("lineitem"); val o = t("orders")
      val c = t("customer"); val su = t("supplier")
      val p = t("part"); val n = t("nation"); val r = t("region")
      val edges = Seq(
        ("customer.c_nationkey->nation", c, "c_nationkey", n, "n_nationkey"),
        ("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
        ("lineitem.l_partkey->part", li, "l_partkey", p, "p_partkey"),
        ("lineitem.l_suppkey->supplier", li, "l_suppkey", su, "s_suppkey"),
        ("nation.n_regionkey->region", n, "n_regionkey", r, "r_regionkey"),
        ("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey"),
        ("supplier.s_nationkey->nation", su, "s_nationkey", n, "n_nationkey"))
      val childAll = edges.map { case (name, ch, ck, _, _) =>
        ch.select(lit(name).as("edge"), col(ck).cast("long").as("k"))
      }.reduce(_ unionByName _)
        .groupBy(col("edge"), col("k")).agg(count(lit(1)).as("rows"))
      val parentAll = edges.map { case (name, _, _, pa, pk) =>
        pa.select(lit(name).as("pedge"), col(pk).cast("long").as("pk"))
      }.reduce(_ unionByName _)
      childAll.join(parentAll,
        col("edge") === col("pedge") && col("k") === col("pk"), "full")
        .groupBy(coalesce(col("edge"), col("pedge"), lit("")).as("edge"))
        .agg(
          coalesce(sum(col("rows")), lit(0L)).cast("long")
            .as("n_child_rows"),
          count(when(col("rows").isNotNull, 1)).as("n_child_keys"),
          count(when(col("rows").isNotNull && col("pk").isNull, 1))
            .as("orphan_keys"),
          coalesce(sum(when(col("pk").isNull, col("rows"))), lit(0L))
            .cast("long").as("orphan_rows"),
          count(when(col("rows").isNull, 1)).as("childless_parents"))
        .select(col("edge"), col("n_child_rows"), col("n_child_keys"),
          col("orphan_keys"), col("orphan_rows"), col("childless_parents"))
        .orderBy(col("edge"))
    }

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    mode match {
      case "eq" =>
        val a = oldIntegrity.collect().toSeq.map(_.toString)
        val b = newIntegrity.collect().toSeq.map(_.toString)
        println(s"[integ] $dir equal=${a == b} (n=${a.size})")
        val sa = oldIntegrity.schema.toString
        val sb = newIntegrity.schema.toString
        println(s"[integ] schemaEqual=${sa == sb}")
        if (sa != sb) { println(sa); println(sb) }
        if (a != b) { a.take(8).foreach(println); println("--");
          b.take(8).foreach(println) }
      case "plan" =>
        println("===== q_integrity BEFORE =====")
        println(oldIntegrity.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        println("===== q_integrity AFTER =====")
        println(newIntegrity.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      case _ =>
        (1 to 4).foreach { i =>
          val tOld = time(oldIntegrity)
          val tNew = time(newIntegrity)
          println(f"[integ] pass $i old=$tOld%.3f new=$tNew%.3f")
        }
    }
    spark.stop()
  }
}
