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

  test("approx_percentile stays within rank-error bounds of exact") {
    // q_percentile_approx's self-check: with accuracy 2500 (the query's
    // setting) the sketch's rank error is ~4e-4; on sf0.001 groups
    // (thousands of rows) the returned value must sit within a few
    // ranks of the exact percentile. Assert via VALUE tolerance against
    // the exact sort: quantities are small integers, so allow one unit;
    // the p99 price gets a relative bound.
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val both = li.groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_quantity, 0.5, 2500)").as("approx_med"),
        expr("percentile(l_quantity, 0.5)").as("exact_med"),
        expr("approx_percentile(l_extendedprice, 0.99, 2500)").as("approx_p99"),
        expr("percentile(l_extendedprice, 0.99)").as("exact_p99"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(math.abs(r.getAs[Number]("approx_med").doubleValue() -
        r.getAs[Double]("exact_med")) <= 1.0,
        s"median sketch too far from exact in $r")
      val (ap, ep) = (r.getAs[Number]("approx_p99").doubleValue(),
        r.getAs[Double]("exact_p99"))
      assert(math.abs(ap - ep) <= math.max(1.0, ep * 0.02),
        s"p99 sketch $ap too far from exact $ep")
    }
  }

  test("count-min sketch estimates obey the CMS guarantee vs exact counts") {
    // q_sketch_freq's self-check: CMS never under-counts, and
    // over-counts by at most eps * N (total items) with the query's
    // eps = 1e-4. Compare the query's estimates against exact GROUP BY
    // counts for the same probe keys.
    import org.apache.spark.sql.functions._
    val est = SparkEntry.queries("q_sketch_freq")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val n = li.count()
    val exact = li.filter(col("l_partkey").between(1L, 20L))
      .groupBy(col("l_partkey")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    est.foreach { case (k, e) =>
      val x = exact.getOrElse(k, 0L)
      assert(e >= x, s"CMS under-counted key $k: est $e < exact $x")
      assert(e <= x + math.max(1L, (n * 1e-4).toLong),
        s"CMS over-count beyond eps*N for key $k: est $e, exact $x, n $n")
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
    // engine-specific sketches/training: rows-only + self-checks above
    // (kmeans correctness is asserted cluster-level in SimilaritySpec)
    val exempt = Set("ann_kmeans_ivf", "ann_pq_topk", "ann_ivfpq_topk")
    val missing = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- exempt
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}
