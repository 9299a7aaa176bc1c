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
