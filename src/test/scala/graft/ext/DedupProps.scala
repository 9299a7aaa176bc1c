package graft.ext

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import graft.TestSpark
import graft.dedup.Dedup

/** ScalaCheck property for connectedComponents: on random graphs the
  * distributed min-label fixpoint must agree with a trivial driver-side
  * union-find — the reference model for "same component, min-id rep".
  */
object DedupProps extends Properties("Dedup.connectedComponents") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6) // each sample runs an iterative Spark loop

  private lazy val spark = TestSpark.spark

  private val genEdges: Gen[List[(Long, Long)]] =
    Gen.choose(1, 25).flatMap { n =>
      Gen.listOfN(n, for {
        a <- Gen.choose(0L, 15L)
        b <- Gen.choose(0L, 15L)
        if a != b
      } yield (a, b))
    }

  private def unionFind(edges: List[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(x => x -> find(x)).toMap
  }

  property("agrees with driver-side union-find on random graphs") =
    Prop.forAll(genEdges) { edges =>
      edges.nonEmpty ==> {
        import spark.implicits._
        val got = Dedup.connectedComponents(
            edges.toDF("id1", "id2"), "id1", "id2")
          .as[(Long, Long)].collect().toMap
        got == unionFind(edges)
      }
    }
}
