package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Runs EVERY SparkEntry query twice at sf0.001 and requires identical
  * results — the property the driver's hash-compare gate assumes. Any
  * nondeterminism (unordered output, arbitrary-row dedup keepers,
  * partition-dependent float sums, non-idempotent KV scratch lifecycle)
  * fails here before it can fail the gate.
  */
class QueryDeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def snapshot(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir)
      .collect().map(_.toString).toSeq

  test("approx_count_distinct stays within the HLL error bound of exact") {
    // the one rows-only query: self-check the sketch against exact
    // distinct counts (default rsd 0.05 -> assert a generous 5 sigma)
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val both = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (approx, exact) = (r.getAs[Long]("approx"), r.getAs[Long]("exact"))
      assert(math.abs(approx - exact) <= math.max(10L, (exact * 0.25).toLong),
        s"HLL estimate $approx too far from exact $exact")
    }
  }

  test("every query is non-failing and yields rows at sf0.001") {
    val counts = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      name -> SparkEntry.queries(name)(spark, dir).count()
    }
    val empty = counts.filter(_._2 == 0).map(_._1)
    assert(empty.isEmpty, s"queries with 0 rows: $empty")
  }

  test("every query is run-to-run deterministic (incl. row order)") {
    val diffs = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val a = snapshot(name)
      val b = snapshot(name)
      if (a == b) None else Some(name)
    }
    assert(diffs.isEmpty, s"nondeterministic queries: $diffs")
  }

  test("every query has an oracle or a documented rows-only exemption") {
    val exempt = Set("dedup_simhash", "q_approx_distinct") // engine-specific algos
    val missing = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- exempt
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}
