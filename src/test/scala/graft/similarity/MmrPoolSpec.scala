package graft.similarity

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Pins the round-12 single-pass mmrRerankPool against an independent
  * driver-side reference of the greedy recurrence the old k-step
  * declarative unroll computed: pick argmax rel (ascending-id ties),
  * then repeatedly argmax 0.7*rel - 0.3*maxSimToPicked with the same
  * Double.compare total order and the CosineQExpr kernel. Random pools
  * exercise ragged pool sizes (1..25 candidates incl. fewer than k),
  * duplicate rel values (tie-breaks) and multiple qids per partition.
  */
class MmrPoolSpec extends SparkSpec {

  private def cos(x: Array[Long], y: Array[Long]): Double = {
    val n = math.min(x.length, y.length)
    var dot = 0L; var na = 0L; var nb = 0L; var i = 0
    while (i < n) {
      dot += x(i) * y(i); na += x(i) * x(i); nb += y(i) * y(i); i += 1
    }
    dot / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  /** Reference greedy over one qid's pool, candidates pre-sorted by id. */
  private def reference(pool: Seq[(Long, Array[Long], Double)], k: Int)
      : Seq[(Long, Int, Double)] = {
    val n = pool.size
    val picked = Array.fill(n)(false)
    val out = Seq.newBuilder[(Long, Int, Double)]
    var sel = List.empty[Int]
    (1 to math.min(k, n)).foreach { t =>
      var best = -1
      var bestScore = 0.0
      pool.indices.foreach { i =>
        if (!picked(i)) {
          val score =
            if (t == 1) pool(i)._3
            else {
              val ms = sel.map(j => cos(pool(i)._2, pool(j)._2))
                .max(Ordering.fromLessThan[Double](
                  (a, b) => java.lang.Double.compare(a, b) < 0))
              0.7 * pool(i)._3 - 0.3 * ms
            }
          if (best < 0 ||
              java.lang.Double.compare(score, bestScore) > 0) {
            best = i; bestScore = score
          }
        }
      }
      picked(best) = true
      sel = best :: sel
      out += ((pool(best)._1, t, pool(best)._3))
    }
    out.result()
  }

  test("mmrRerankPool matches the reference greedy on random ragged pools") {
    val rnd = new scala.util.Random(421)
    val dims = 8
    val pools: Map[Long, Seq[(Long, Array[Long], Double)]] =
      (0L until 40L).map { qid =>
        val m = 1 + rnd.nextInt(25)
        val cands = (0 until m).map { i =>
          val cq = Array.fill(dims)((rnd.nextInt(20001) - 10000).toLong)
          // quarter of rels drawn from a tiny set to force ties
          val rel =
            if (rnd.nextInt(4) == 0) rnd.nextInt(3) * 0.25
            else rnd.nextDouble()
          (qid * 100 + i, cq, rel)
        }
        qid -> cands.sortBy(_._1)
      }.toMap
    val rows = pools.toSeq.flatMap { case (qid, cands) =>
      cands.map { case (id, cq, rel) => Row(qid, id, cq.toSeq, rel) }
    }
    val schema = StructType(Seq(
      StructField("qid", LongType), StructField("id", LongType),
      StructField("cq", ArrayType(LongType)),
      StructField("rel", DoubleType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 7), schema)
    val got = Similarity.mmrRerankPool(df, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val want = pools.toSeq.sortBy(_._1).flatMap { case (qid, cands) =>
      reference(cands, 5).map { case (id, t, rel) => (qid, id, t, rel) }
    }
    assert(got.toSeq === want)
  }
}
