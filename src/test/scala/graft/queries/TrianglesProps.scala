package graft.queries

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.TestSpark

/** Property pin for the degree-oriented triangle count: on RANDOM
  * graphs it must equal a driver-side brute-force enumeration. The
  * oracle gate proves Spark==DuckDB on ONE graph shape; this proves
  * the orientation/wedge algebra on arbitrary shapes — including the
  * tie-heavy regular graphs where a wrong (degree, id) tiebreak
  * double-counts or drops triangles.
  */
object TrianglesProps extends Properties("RelationalQueries.triangles") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12) // each sample runs checkpointed joins

  private lazy val spark = TestSpark.spark

  private def bruteForce(edges: Set[(Long, Long)]): Long = {
    val adj = edges.foldLeft(Map.empty[Long, Set[Long]]) {
      case (m, (a, b)) =>
        m.updated(a, m.getOrElse(a, Set.empty[Long]) + b)
          .updated(b, m.getOrElse(b, Set.empty[Long]) + a)
    }
    // inner generators must be Seq: a for-comprehension whose first
    // inner generator is a Set turns `yield 1` into Set(1) and
    // collapses the whole count to participating-node count — this
    // exact bug shipped in the first version of this property and
    // falsified a CORRECT implementation
    (for {
      a <- adj.keys.toSeq; b <- adj(a).toSeq if b > a
      c <- adj(b).toSeq if c > b && adj(a)(c)
    } yield (a, b, c)).size.toLong
  }

  private val graphGen: Gen[Set[(Long, Long)]] = for {
    n <- Gen.choose(3, 14)
    density <- Gen.choose(1, 9)
    picks <- Gen.listOfN(n * n,
      Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L),
        Gen.choose(1, 10)))
  } yield picks.collect {
    case (a, b, keep) if a != b && keep <= density =>
      (math.min(a, b), math.max(a, b))
  }.toSet

  property("oriented count == brute force on random graphs") =
    Prop.forAll(graphGen) { raw =>
      // re-normalize inside the property: ScalaCheck SHRINKS tuples
      // without the generator's invariants, so a shrunk sample can
      // carry self-loops or both directions of one edge — normalize
      // to the operator's (src < dst, deduped) contract first
      val edges = raw.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }
      edges.nonEmpty ==> {
        import spark.implicits._
        val row = RelationalQueries
          .orientedTriangles(edges.toSeq.toDF("src", "dst")).head()
        (row.getAs[Long]("n_triangles") == bruteForce(edges)) :| "count" &&
          (row.getAs[Long]("n_edges") == edges.size.toLong) :| "edges" &&
          (row.getAs[Long]("n_nodes") ==
            edges.flatMap(e => Seq(e._1, e._2)).size.toLong) :| "nodes"
      }
    }

  property("complete graph K5 (all degrees tied) counts C(5,3) = 10") =
    Prop {
      import spark.implicits._
      val edges = for { a <- 0L until 5L; b <- (a + 1) until 5L }
        yield (a, b)
      RelationalQueries.orientedTriangles(edges.toDF("src", "dst"))
        .head().getAs[Long]("n_triangles") == 10L
    }

  property("triangle-free star counts zero") = Prop {
    import spark.implicits._
    val edges = (1L to 6L).map(b => (0L, b))
    RelationalQueries.orientedTriangles(edges.toDF("src", "dst"))
      .head().getAs[Long]("n_triangles") == 0L
  }
}
