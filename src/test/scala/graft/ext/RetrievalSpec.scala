package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.dedup.Dedup
import graft.similarity.Similarity

/** Specs for the round-8 retrieval/resolution operators: the blocked
  * edit-distance (fuzzy) join, hard-negative mining, and BM25 ranked
  * retrieval. Expected values are recomputed independently in scalar
  * Scala from the raw inputs — not read back from the operators.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame,
                    maxBlock: Int = 10000): Seq[(Long, Long, Int)] =
    Dedup.blockedEditDistancePairs(df.toDF("id", "blk", "k"), "id",
        col("k"), col("blk"), maxDist = 2, maxBlock = maxBlock)
      .orderBy("id1", "id2")
      .as[(Long, Long, Int)].collect().toSeq

  test("in-block pairs within threshold, with exact distances") {
    val df = Seq(
      (1L, "A", "kitten"), (2L, "A", "sitten"),   // 1 substitution
      (10L, "E", "abcd"), (11L, "E", "abXY")      // exactly maxDist
    ).toDF("id", "blk", "k")
    assert(pairs(df) === Seq((1L, 2L, 1), (10L, 11L, 2)))
  }

  test("blocking is a hard boundary: identical keys in different " +
      "blocks never pair; singleton blocks produce nothing") {
    val df = Seq(
      (1L, "A", "kitten"), (4L, "B", "kitten"), // dist 0 but cross-block
      (5L, "C", "solo"))
      .toDF("id", "blk", "k")
    assert(pairs(df) === Seq.empty)
  }

  test("length pre-guard and threshold DP agree: |len| > maxDist " +
      "pairs are exactly the ones the full distance also rejects") {
    val df = Seq(
      (1L, "A", "kitten"), (3L, "A", "sittin!xx"), // lengths 6 vs 9
      (2L, "A", "sitten")).toDF("id", "blk", "k")
    // only (1,2) survives; (1,3) and (2,3) have dist >= 3
    assert(pairs(df) === Seq((1L, 2L, 1)))
  }

  test("blocks above maxBlock are dropped whole") {
    val big = (1 to 4).map(i => (100L + i, "D", "dup"))
    val df = (big :+ ((1L, "A", "kitten")) :+ ((2L, "A", "sitten")))
      .toDF("id", "blk", "k")
    assert(pairs(df, maxBlock = 3) === Seq((1L, 2L, 1)))
  }
}

class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  test("excludes self and same-label rows; ranks by cosine desc") {
    val rows = Seq(
      (0L, 0, Seq(1.0f, 0.0f)),
      (1L, 0, Seq(0.9f, 0.1f)),   // same label: must be excluded
      (2L, 1, Seq(0.95f, 0.05f)),
      (3L, 1, Seq(0.0f, 1.0f)),
      (4L, 1, Seq(1.0f, 0.01f))).toDF("vec_id", "label", "embedding")
    val queries = rows.filter($"vec_id" === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"),
        $"label".as("qlabel"))
    val corpus = rows.select($"vec_id".as("id"), $"embedding".as("vec"),
      $"label")
    val got = Similarity.hardNegatives(queries, corpus, 2)
      .select("qid", "id", "rank").as[(Long, Long, Int)]
      .collect().toSeq.sortBy(_._3)
    // nearest different-label: id 4 (cos ~.99995), then id 2 (~.9986);
    // id 1 (cos ~.9939) is CLOSER than id 2 but shares the label
    assert(got === Seq((0L, 4L, 1), (0L, 2L, 2)))
  }

  test("k caps the result and rank is dense from 1") {
    val rows = Seq(
      (0L, 0, Seq(1.0f, 0.0f)), (5L, 2, Seq(0.5f, 0.5f)),
      (6L, 3, Seq(0.4f, 0.6f)), (7L, 4, Seq(0.3f, 0.7f)))
      .toDF("vec_id", "label", "embedding")
    val queries = rows.filter($"vec_id" === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"),
        $"label".as("qlabel"))
    val corpus = rows.select($"vec_id".as("id"), $"embedding".as("vec"),
      $"label")
    val got = Similarity.hardNegatives(queries, corpus, 3)
      .select("id", "rank").as[(Long, Int)].collect().toSeq.sortBy(_._2)
    assert(got === Seq((5L, 1), (6L, 2), (7L, 3)))
  }
}

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("lift equals an exact scalar recomputation; support filter " +
      "and ordering hold") {
    // "alpha beta" appears 6x (strong collocation), "alpha gamma" 5x,
    // "beta alpha" fills the marginals; "delta echo" only 4x -> cut
    // by the support filter
    val doc1 = (("alpha beta " * 6) + ("alpha gamma " * 5)).trim
    val doc2 = ("delta echo " * 4).trim
    val dir = graft.TestSpark.scratch("collodocs")
    Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.queries.TextQueries.defs("text_collocations")(spark, dir)
      .as[(String, String, Long, Long)].collect().toSeq
    // scalar recomputation from the raw pair stream
    def pairsOf(t: String) = { val w = t.split(" "); w.init.zip(w.tail) }
    val all = pairsOf(doc1) ++ pairsOf(doc2)
    val cab = all.groupBy(identity).view.mapValues(_.size).toMap
    val c1 = all.groupBy(_._1).view.mapValues(_.size).toMap
    val c2 = all.groupBy(_._2).view.mapValues(_.size).toMap
    val n = all.size
    val want = cab.filter(_._2 >= 5).map { case ((a, b), c) =>
      (a, b, c.toLong,
        (BigInt(c) * n * 1000000 / (BigInt(c1(a)) * c2(b))).toLong)
    }.toSeq.sortBy { case (a, b, _, l) => (-l, a, b) }
    assert(got === want)
    assert(!got.exists(r => r._1 == "delta")) // support-filtered
  }
}

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  /** Scalar reimplementation of the query's scoring — same formula,
    * same op order, recomputed from the raw corpus (stats included),
    * so the distributed agg plumbing is what's under test. */
  private def bm25Micro(corpus: Seq[(Long, String)],
                        terms: Seq[String]): Map[Long, Long] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.trim.split("\\s+").toSeq }.toMap
    val n = corpus.size.toDouble
    val sumdl = toks.values.map(_.size.toLong).sum.toDouble
    val avgdl = sumdl / n
    val df = terms.map(t => toks.values.count(_.contains(t)).toDouble)
    corpus.flatMap { case (id, _) =>
      val dl = toks(id).size.toDouble
      val tf = terms.map(t => toks(id).count(_ == t).toDouble)
      if (tf.sum == 0) None
      else {
        val score = terms.indices.map { i =>
          val idf = (n - df(i) + 0.5) / (df(i) + 0.5)
          idf * ((tf(i) * 2.2) /
            (tf(i) + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
        }.reduce(_ + _)
        Some(id -> math.floor(score * 1000000.0).toLong)
      }
    }.toMap
  }

  test("scores match an independent scalar recomputation and rank " +
      "orders by score desc with doc_id tiebreak") {
    val corpus = Seq(
      (1L, "merge vector slow"),
      (2L, "merge merge alpha beta"),
      (3L, "alpha beta gamma"), // no query term: filtered out
      (4L, "slow slow slow slow"))
    val dir = graft.TestSpark.scratch("bm25docs")
    corpus.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = graft.queries.TextQueries.defs("text_bm25")(spark, dir)
      .select("doc_id", "score_micro", "rank")
      .as[(Long, Long, Int)].collect().toSeq
    val want = bm25Micro(corpus, Seq("merge", "vector", "slow"))
    assert(got.map(_._1).toSet === Set(1L, 2L, 4L))
    got.foreach { case (id, micro, _) => assert(micro === want(id)) }
    // ranks follow score desc
    assert(got.sortBy(_._3).map(_._2) ===
      got.map(_._2).sortBy(-_))
  }

  test("a term absent from the corpus contributes nothing and a " +
      "doc of only stop-like tokens never surfaces") {
    val corpus = Seq((1L, "merge alpha"), (2L, "beta gamma"))
    val dir = graft.TestSpark.scratch("bm25docs2")
    corpus.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = graft.queries.TextQueries.defs("text_bm25")(spark, dir)
      .select("doc_id", "score_micro")
      .as[(Long, Long)].collect().toSeq
    val want = bm25Micro(corpus, Seq("merge", "vector", "slow"))
    assert(got === Seq((1L, want(1L))))
  }
}
