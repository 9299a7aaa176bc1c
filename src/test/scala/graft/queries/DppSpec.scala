package graft.queries

import org.apache.spark.sql.functions._
import graft.{SparkSpec, TestSpark}

/** Dynamic partition pruning plan shape: joining a Hive-partitioned
  * fact on its partition column against a selectively-filtered dim must
  * inject a DynamicPruningSubquery into the fact scan, so only the
  * dim-surviving partitions are read at runtime.
  */
class DppSpec extends SparkSpec {
  import spark.implicits._

  test("fact scan carries a dynamic pruning partition filter and reads " +
    "only the dim-selected partition") {
    val fact = TestSpark.scratch("dppfact")
    val dim = TestSpark.scratch("dppdim")
    (1 to 300).map(i => (i.toLong, Seq("R", "A", "N")(i % 3)))
      .toDF("id", "flag")
      .write.partitionBy("flag").parquet(fact)
    Seq(("R", "returned"), ("A", "accepted"), ("N", "none"))
      .toDF("flag2", "label").coalesce(1).write.parquet(dim)

    val df = spark.read.parquet(fact)
      .join(spark.read.parquet(dim).filter($"label" === "returned"),
        $"flag" === $"flag2")
      .groupBy($"label").agg(count(lit(1)).as("n"))

    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no DynamicPruningSubquery in plan:\n$plan")
    assert(df.as[(String, Long)].collect() === Array(("returned", 100L)))
  }

  test("ann_ivf_served partition-prunes the persisted assignment to " +
      "the probed lists (the 100 TB IVF serving layout)") {
    val dir = "/root/testdata/sf0.001"
    SimQueries.prepares("ann_ivf_served")(spark, dir)
    val df = SimQueries.defs("ann_ivf_served")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"served IVF scan lost its DynamicPruningSubquery — every list " +
        s"would be read:\n$plan")
    assert(df.count() > 0)
  }

  test("ann_mmr_ivf draws its candidate pool through the same pruned " +
      "index probe: the assignment scan keeps its DynamicPruningSubquery " +
      "and the pool never triggers a brute-force corpus pass") {
    val dir = "/root/testdata/sf0.001"
    SimQueries.prepares("ann_mmr_ivf")(spark, dir)
    val df = SimQueries.defs("ann_mmr_ivf")(spark, dir)
    // the greedy unroll localCheckpoints the pool, so the DPP evidence
    // lives in the POOL plan — rebuild it exactly as the query does
    val path = scratchDir("ann_served_model", dir)
    val pool = graft.similarity.Similarity.ivfSearchAssigned(
      spark.read.parquet(s"$path/assigned"),
      spark.read.parquet(s"$path/queries"),
      spark.read.parquet(s"$path/cents"), nprobe = 4, k = 20,
      keepVec = true)
    val plan = pool.queryExecution.executedPlan.toString()
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"MMR pool scan lost its DynamicPruningSubquery:\n$plan")
    // and the final MMR output is non-degenerate: 5 DISTINCT picks
    // per query, ranks 1..5
    val rows = df.collect()
    assert(rows.length === 50)
    val perQ = rows.groupBy(_.getLong(0))
    assert(perQ.forall(_._2.map(_.getLong(1)).distinct.length === 5),
      "a query picked the same candidate twice")
  }

  test("ann_ivf_appended serves the post-append layout with the same " +
      "partition pruning, and the drift sidecar accounts for base + " +
      "batch with untouched centroids (no retrain)") {
    val dir = "/root/testdata/sf0.001"
    SimQueries.prepares("ann_ivf_appended")(spark, dir)
    val df = SimQueries.defs("ann_ivf_appended")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"appended IVF scan lost its DynamicPruningSubquery:\n$plan")
    assert(df.count() > 0)
    // drift sidecar: per-list base:after counts; totals must equal
    // corpus + batch (batch = every-10th vector => n/10 rounded up)
    val path = java.nio.file.Paths.get(
      scratchDir("ann_appended_model", dir), "listcounts.txt")
    val counts = java.nio.file.Files.readString(path).split('\n')
      .map { l => val a = l.split(':'); (a(1).toLong, a(2).toLong) }
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(counts.map(_._1).sum === n, "base list counts != corpus size")
    assert(counts.map(_._2).sum === n + (n + 9) / 10,
      "post-append counts != corpus + batch")
    assert(counts.forall { case (b, a) => a >= b },
      "appending removed rows from a list")
  }

  test("ann_ivf_rebalanced splits the heaviest list IN PLACE: old list " +
      "directory gone, two sub-lists present, total rows preserved, " +
      "serving still partition-prunes over the post-rebalance routing") {
    val dir = "/root/testdata/sf0.001"
    SimQueries.prepares("ann_ivf_rebalanced")(spark, dir)
    val df = SimQueries.defs("ann_ivf_rebalanced")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"rebalanced IVF scan lost its DynamicPruningSubquery:\n$plan")
    assert(df.count() > 0)
    val path = scratchDir("ann_rebalanced_model", dir)
    val hot = java.nio.file.Files.readString(
      java.nio.file.Paths.get(path, "rebalance.txt")).trim.toInt
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$path/assigned", s"cid=$hot")),
      s"split list cid=$hot still on disk")
    val assigned = spark.read.parquet(s"$path/assigned")
    val cids = assigned.select("cid").distinct().collect()
      .map(_.get(0).toString.toInt).toSet
    val maxOrig = 15 // k = 16 original lists, cids 0..15
    assert(!cids.contains(hot) &&
      cids.contains(maxOrig + 1) && cids.contains(maxOrig + 2),
      s"expected sub-lists ${maxOrig + 1},${maxOrig + 2} without $hot: $cids")
    // rows preserved: corpus + batch (every-10th vector appended)
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(assigned.count() === n + (n + 9) / 10,
      "rebalance changed the total row count")
  }
}
