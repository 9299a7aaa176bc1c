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

  test("bigram LM: hand-computed probabilities, backoff, and floor") {
    import graft.text.Lm
    // train corpus: "a b a b" ×2 and "a c" ×1 →
    //   bigrams: (a,b)=4? no — per doc: "a b a b" has (a,b),(b,a),(a,b)
    //   so counts: (a,b)=4, (b,a)=2, (a,c)=1; histories a=5, b=2;
    //   vocab = {a,b,c} → V=3
    val train = Seq((1L, "a b a b"), (2L, "a b a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val m = Lm.train(train, "text", maxBigrams = 100)
    def q(p: Double): Long = math.round(1e6 * math.log(p))
    assert(m.bigramMap === Map(
      ("a", "b") -> q(5.0 / 8), // (4+1)/(5+3)
      ("b", "a") -> q(3.0 / 5), // (2+1)/(2+3)
      ("a", "c") -> q(2.0 / 8)))
    assert(m.historyMap === Map("a" -> q(1.0 / 8), "b" -> q(1.0 / 5)))
    assert(m.floorLp === q(1.0 / 3))
    // scoring: seen bigram, backoff (unseen bigram with known
    // history), floor (unseen history), and a <2-token doc
    val docs = Seq(
      (10L, "a b"),   // seen: lp(a,b)
      (11L, "b b"),   // backoff: history b, lp0(b)
      (12L, "z a"),   // floor: unseen history z
      (13L, "a")      // no bigrams at all
    ).toDF("doc_id", "text")
    val got = Lm.score(docs, "doc_id", "text", m)
      .orderBy("doc_id").as[(Long, Int, Long)].collect()
    assert(got === Array(
      (10L, 1, q(5.0 / 8)),
      (11L, 1, q(1.0 / 5)),
      (12L, 1, q(1.0 / 3)),
      (13L, 0, 0L)))
    // pruning cap: keep only the top-1 bigram; the rest must score
    // through backoff with UNCHANGED denominators
    val pruned = Lm.train(train, "text", maxBigrams = 1)
    assert(pruned.bigramMap === Map(("a", "b") -> q(5.0 / 8)))
    val g2 = Lm.score(Seq((20L, "b a")).toDF("doc_id", "text"),
      "doc_id", "text", pruned).as[(Long, Int, Long)].head()
    assert(g2 === ((20L, 1, q(1.0 / 5)))) // backoff, not the pruned lp
    // history cap: keep only the top-1 history (a, hn=5). A PRUNED
    // history (b) scores through the ln(1/V) floor — and kept bigrams
    // keep their FULL denominators, because those come from the
    // distributed join against the uncollected history table, not from
    // the capped broadcast set.
    val hCapped = Lm.train(train, "text", maxBigrams = 100,
      maxHistories = 1)
    assert(hCapped.historyMap === Map("a" -> q(1.0 / 8)))
    assert(hCapped.bigramMap(("b", "a")) === q(3.0 / 5)) // (2+1)/(2+3)
    val g3 = Lm.score(
      Seq((30L, "b b"), (31L, "b a")).toDF("doc_id", "text"),
      "doc_id", "text", hCapped).orderBy("doc_id")
      .as[(Long, Int, Long)].collect()
    assert(g3 === Array(
      (30L, 1, q(1.0 / 3)),  // pruned history → floor, not lp0(b)
      (31L, 1, q(3.0 / 5)))) // kept bigram unchanged by the cap
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
