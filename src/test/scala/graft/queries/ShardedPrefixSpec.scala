package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral pins for the two-phase shard-prefix window (the
  * scale-safe replacement for `Window.orderBy(...)` over a
  * linearly-growing dimension, used by q_rfm / q_pareto_abc):
  * bit-identical rank and running sums vs the one-window form, on
  * tied data (unique-id tiebreak), ascending and descending; and
  * ntileOfRank == the engines' own NTILE for every n around the
  * bucket-remainder edges (the formula DuckDB's oracle windows rely
  * on — first n mod k buckets get the extra row). */
class ShardedPrefixSpec extends SparkSpec {

  // small value domain forces ties across shard boundaries; id is the
  // total-order tiebreak, x the summed payload
  private def corpus(n: Int) = {
    import spark.implicits._
    spark.range(n).select(col("id"),
      pmod(xxhash64(col("id")), lit(7)).as("v"),
      pmod(xxhash64(col("id") + 10000), lit(1000)).as("x"))
  }

  test("shardedPrefix rank/cumsum/n/total are bit-identical to the " +
      "single global window (ascending, ties crossing shards)") {
    val df = corpus(997)
    val got = RelationalQueries.shardedPrefix(df,
        Seq(col("v"), col("id")), "rk",
        sums = Seq((col("x"), "cx")), nOut = Some("n"), totals = true)
      .select("id", "rk", "cx", "n", "cx_total")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val w = Window.orderBy(col("v"), col("id"))
    val exp = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cx", sum(col("x")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "rk", "cx")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val totalX = df.agg(sum("x")).head().getLong(0)
    assert(got.keySet === exp.keySet)
    got.foreach { case (id, (rk, cx, n, tot)) =>
      assert((rk, cx) === exp(id), s"id=$id")
      assert(n === 997L && tot === totalX, s"id=$id")
    }
  }

  test("shardedPrefix matches the global window under DESC order " +
      "(the q_pareto_abc shape)") {
    val df = corpus(500)
    val order = Seq(col("v").desc, col("id"))
    val got = RelationalQueries.shardedPrefix(df, order, "rk",
        sums = Seq((col("x"), "cx")))
      .select("id", "rk", "cx")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val w = Window.orderBy(order: _*)
    val exp = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cx", sum(col("x")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "rk", "cx")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got === exp)
  }

  test("ntileOfRank(rank, n, k) equals the engine's ntile(k) for every " +
      "n across the remainder edges, k in {3, 4, 7}") {
    import spark.implicits._
    for (k <- Seq(3, 4, 7); n <- (1 to 2 * k + 1) ++ Seq(97, 1000)) {
      val df = spark.range(1, n + 1).toDF("rk")
        .withColumn("n", lit(n.toLong))
      val got = df
        .withColumn("t", RelationalQueries.ntileOfRank("rk", "n", k))
        .orderBy("rk").select("t").as[Int].collect().toSeq
      val exp = df
        .withColumn("t", ntile(k).over(Window.orderBy(col("rk"))))
        .orderBy("rk").select("t").as[Int].collect().toSeq
      assert(got === exp, s"n=$n k=$k")
    }
  }
}
