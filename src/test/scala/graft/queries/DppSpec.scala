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
}
