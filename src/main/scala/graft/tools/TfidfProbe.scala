package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 probe for text_tfidf: decomposes the current shape (tf
  * pre-agg / df agg / join), checks the TokenCountsExpr rewrite for
  * row-level equality against the current query at 3 SFs, and
  * interleaves old-vs-new timings. Usage: TfidfProbe <sfDir>
  * [eq|time|decomp]
  */
object TfidfProbe {
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
    import org.apache.spark.sql.expressions.Window

    // the pre-rewrite declared shape, kept verbatim for the A/B
    def oldTfidf: DataFrame = {
      val tf = graft.queries.table(spark, dir, "documents")
        .select(col("doc_id"),
          explode(graft.text.TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      tf.join(df, "token")
        .withColumn("rk", row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("tf").desc, col("df").asc, col("token"))))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("token"), col("tf"), col("df"), col("rk"))
        .orderBy(col("doc_id"), col("rk"))
    }

    // candidate: per-doc token counts computed map-side (TokenCountsExpr)
    def newTfidf: DataFrame = {
      graft.functions.Native.register(spark)
      val tf = graft.queries.table(spark, dir, "documents")
        .select(col("doc_id"),
          explode(graft.functions.Native.tokenCounts(col("text"))).as("e"))
        .select(col("doc_id"), col("e.token").as("token"),
          col("e.tf").as("tf"))
      val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      tf.join(df, "token")
        .withColumn("rk", row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("tf").desc, col("df").asc, col("token"))))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("token"), col("tf"), col("df"), col("rk"))
        .orderBy(col("doc_id"), col("rk"))
    }

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    mode match {
      case "eq" =>
        val a = oldTfidf.collect().toSeq.map(_.toString)
        val b = newTfidf.collect().toSeq.map(_.toString)
        println(s"[tfidf] $dir equal=${a == b} (n=${a.size})")
        val sa = oldTfidf.schema.toString
        val sb = newTfidf.schema.toString
        println(s"[tfidf] schemaEqual=${sa == sb}")
        if (sa != sb) { println(sa); println(sb) }
      case "plan" =>
        println("===== text_tfidf BEFORE =====")
        println(oldTfidf.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        println("===== text_tfidf AFTER =====")
        println(graft.SparkEntry.queries("text_tfidf")(spark, dir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      case "decomp" =>
        def tf = graft.queries.table(spark, dir, "documents")
          .select(col("doc_id"),
            explode(graft.text.TextOps.tokens(col("text"))).as("token"))
          .groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("tf"))
        def dfT = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
        println(s"[tfidf] tf rows=${tf.count()} vocab=${dfT.count()}")
        (1 to 3).foreach { i =>
          val t1 = time(tf)
          val t2 = time(dfT)
          val t4 = time(oldTfidf)
          println(f"[tfidf] pass $i tf=$t1%.3f df=$t2%.3f full=$t4%.3f")
        }
      case _ =>
        (1 to 4).foreach { i =>
          val tOld = time(oldTfidf)
          val tNew = time(newTfidf)
          println(f"[tfidf] pass $i old=$tOld%.3f new=$tNew%.3f")
        }
    }
    spark.stop()
  }
}
