package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.dedup.Dedup

/** Adversarial component shapes for [[Dedup.connectedComponents]] — the
  * scale cases a random-graph property never generates:
  *
  *  - a 10k-node CHAIN (diameter 10k): plain min-label propagation
  *    needs ~diameter rounds; the pointer-jumping (path-halving) step
  *    must bring it to O(log diameter). The `maxRounds` bound IS the
  *    assertion — convergence past it throws.
  *  - a 50k-leaf STAR: one giant component whose `rep` concentrates on
  *    a single label, the worst case for the rep(rep) self-join's key
  *    distribution. Must complete at default test memory.
  */
class DedupScaleSpec extends SparkSpec {

  test("10k-node chain converges within the O(log diameter) round bound") {
    val n = 10000L
    val edges = spark.range(n - 1)
      .select(col("id").as("id1"), (col("id") + 1).as("id2"))
    // ceil(log2(10000)) = 14 rounds of path halving to cover the
    // diameter, +1 no-change round for convergence detection, +5 slack
    // for halving constants. Plain propagation would need ~10,000.
    val labels = Dedup.connectedComponents(edges, "id1", "id2", maxRounds = 20)
    assert(labels.count() === n)
    assert(labels.filter(col("rep") =!= 0L).count() === 0L,
      "every chain node must label to the min id")
    Dedup.freeCheckpoint(labels)
  }

  test("50k-leaf star (single giant component, hot rep key) completes " +
    "and labels to the center") {
    val n = 50000L
    val edges = spark.range(1L, n + 1L)
      .select(lit(0L).as("id1"), col("id").as("id2"))
    val labels = Dedup.connectedComponents(edges, "id1", "id2", maxRounds = 6)
    assert(labels.count() === n + 1)
    assert(labels.filter(col("rep") =!= 0L).count() === 0L)
    Dedup.freeCheckpoint(labels)
  }
}
