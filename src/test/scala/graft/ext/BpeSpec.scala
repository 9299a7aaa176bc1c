package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.text.Bpe

/** BPE trainer contract: the merge table on the classic reference
  * corpus is pinned BY HAND (the oracle embeds trained merges as
  * literals, so training itself must be verified independently), and
  * the column-level replace-chain application is proven equivalent to
  * the trainer's own symbol-level merge step.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merge table on the reference corpus matches the hand computation") {
    // Sennrich et al.'s worked example {low×5, lower×2, newest×6,
    // widest×3} with EOW '_'. Hand-computed pair counts give, in
    // order (max count, ties lexicographic):
    //   1. (e,s) 9   2. (es,t) 9   3. (est,_) 9
    //   4. (l,o) 7   5. (lo,w) 7   6. (e,w) 6
    val corpus =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = corpus.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", merges = 6, maxVocab = 100)
    assert(merges === Seq(("e", "s"), ("es", "t"), ("est", "_"),
      ("l", "o"), ("lo", "w"), ("e", "w")))
  }

  test("training stops early when no adjacent pairs remain") {
    val docs = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    // "ab_": merge (a,b) → [ab,_], then (ab,_) → [ab_]; a single
    // symbol has no pairs, so 2 merges exhaust the vocabulary
    val merges = Bpe.train(docs, "text", merges = 10, maxVocab = 100)
    assert(merges.length === 2)
    assert(merges.head === (("a", "b")))
  }

  test("column replace-chain application equals the trainer's merge step") {
    // Apply the trained merges both ways on fresh text: symbol-level
    // mergePair folding (the trainer's ground truth) vs the nested
    // literal replacements the query and the SQL oracle run.
    val corpus = Seq.fill(5)("low") ++ Seq.fill(6)("newest") ++
      Seq.fill(3)("widest") ++ Seq.fill(2)("lower")
    val docs = corpus.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", merges = 8, maxVocab = 100)
    val texts = Seq("low lower newest", "widest low waste", "new est wid")
    def refTokens(text: String): Int =
      text.split(" ").map { w =>
        var syms = (w + Bpe.Eow).map(_.toString).toArray
        merges.foreach { case (l, r) => syms = Bpe.mergePair(syms, l, r) }
        syms.length
      }.sum
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select(col("id"),
      Bpe.tokenCount(
        Bpe.applyMerges(Bpe.canonical(col("text")), merges),
        size(split(col("text"), " "))).as("n"))
      .orderBy("id").as[(Long, Int)].collect().map(_._2)
    assert(got.toSeq === texts.map(refTokens))
  }
}
