package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Functional contract of q_pagerank's graduated edge derivation
  * (coSupplyEdges): the all-pairs regime below the threshold, the
  * star regime above it, and the observe-metered drop accounting —
  * the hot-group shape (a mega-order) the key-skew replicas never
  * generate, pinned by hand here and exercised at scale by the
  * hot-orderkey campaign leg.
  */
class CoSupplyEdgesSpec extends SparkSpec {
  import spark.implicits._

  private def edgeSet(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long)].collect().toSet

  test("small groups emit the full ordered-pair clique") {
    val li = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 40L))
      .toDF("ok", "sk")
    val got = edgeSet(RelationalQueries.coSupplyEdges(li, starT = 64))
    assert(got === Set(
      (10L, 20L), (20L, 10L), (10L, 30L), (30L, 10L),
      (20L, 30L), (30L, 20L), // ok=1 clique
      (10L, 40L), (40L, 10L))) // ok=2 pair
  }

  test("a group past the threshold degrades to star pairs around " +
      "min(sk), both directions — O(m), still no dangling mass") {
    // ok=1 small (2 members), ok=2 hot (4 members > starT=3)
    val li = Seq((1L, 10L), (1L, 20L),
      (2L, 50L), (2L, 40L), (2L, 70L), (2L, 60L)).toDF("ok", "sk")
      .repartition(2)
    val edges = RelationalQueries.coSupplyEdges(li, starT = 3)
    // observed metrics live on the queryExecution that actually ran —
    // collect through the df itself, not a derived Dataset
    val rows = edges.collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set(
      (10L, 20L), (20L, 10L), // small clique
      (50L, 40L), (40L, 50L), (60L, 40L), (40L, 60L), // star on pivot 40
      (70L, 40L), (40L, 70L)))
    // every member of the hot group keeps outdeg >= 1
    val outdeg = edges.groupBy("src").count().as[(Long, Long)]
      .collect().toMap
    Seq(40L, 50L, 60L, 70L).foreach(sk => assert(outdeg(sk) >= 1))
    // drops are observe-metered, never silent: (m-1)(m-2) = 6 ordered
    // pairs traded for the star
    val m = edges.queryExecution.observedMetrics("pagerank_expansion")
    assert(m.getAs[Long]("star_groups") === 1L)
    assert(m.getAs[Long]("max_group") === 4L)
    assert(m.getAs[Long]("dropped_pairs") === 6L)
  }

  test("a member shared by a hot and a cold group keeps its clique " +
      "edges; duplicates across regimes collapse") {
    val li = Seq((1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 20L), (2L, 30L), (2L, 40L)).toDF("ok", "sk")
    val got = edgeSet(RelationalQueries.coSupplyEdges(li, starT = 3))
    // ok=2 is hot (pivot 10): star only; (10,20) also comes from ok=1
    // and must appear exactly once
    assert(got === Set(
      (10L, 20L), (20L, 10L),
      (10L, 30L), (30L, 10L), (10L, 40L), (40L, 10L)))
  }
}
