package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.text.Classifier

/** NB log-count-ratio classifier contract: weights on a tiny labeled
  * corpus are pinned BY HAND (the oracle embeds trained weights as
  * literals, so training itself must be verified independently), and
  * scoring covers the in-vocab, OOV-default, pruned-vocab, and
  * empty-document paths.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def q(p: Double): Long = math.round(1e6 * math.log(p))

  // {the cat sat, the dog ran}+ vs {le chat noir, le chien brun}- :
  // NPos = NNeg = 6 occurrences, V = 10 distinct tokens, so every
  // weight is q((cp+1)/16) - q((cn+1)/16).
  private lazy val labeled = Seq(
    (1L, "the cat sat", true), (2L, "the dog ran", true),
    (3L, "le chat noir", false), (4L, "le chien brun", false))
    .toDF("doc_id", "text", "y")

  test("weights, default and bias match the hand computation") {
    val m = Classifier.train(labeled, "text", "y", maxVocab = 100)
    val w = m.weights.toMap
    assert(w("the") === q(3.0 / 16) - q(1.0 / 16))
    assert(w("cat") === q(2.0 / 16) - q(1.0 / 16))
    assert(w("le") === q(1.0 / 16) - q(3.0 / 16))
    assert(w.size === 10)
    // symmetric smoothing: an OOV token carries no evidence here
    assert(m.defaultW === 0L)
    // balanced classes: bias = q((2+1)/(2+1)) = 0
    assert(m.bias === 0L)
    // weights are emitted token-sorted (deterministic sidecar bytes)
    assert(m.weights.map(_._1) === m.weights.map(_._1).sorted)
  }

  test("pruning keeps top-count tokens with lexicographic tiebreak") {
    val m = Classifier.train(labeled, "text", "y", maxVocab = 3)
    // totals: le=2, the=2, everything else 1 → keep {le, the} then the
    // lexicographically first singleton, brun
    assert(m.weights.map(_._1).toSet === Set("brun", "le", "the"))
    // pruning must not move the smoothing denominators: same values
    val full = Classifier.train(labeled, "text", "y", maxVocab = 100)
    assert(m.weights.toMap.apply("the") === full.weights.toMap.apply("the"))
    assert(m.defaultW === full.defaultW)
  }

  test("scoring: in-vocab, OOV default, empty doc, prediction sign") {
    val m = Classifier.train(labeled, "text", "y", maxVocab = 100)
    val docs = Seq((10L, "the the cat"), (11L, "le zebra"), (12L, ""))
      .toDF("doc_id", "text")
    val out = Classifier.score(docs, "doc_id", "text", m)
      .orderBy("doc_id").collect()
    val wTbl = m.weights.toMap
    assert(out(0).getInt(1) === 3)
    assert(out(0).getLong(2) === 2 * wTbl("the") + wTbl("cat"))
    assert(out(0).getBoolean(3)) // positive evidence → pred true
    assert(out(1).getLong(2) === wTbl("le") + m.defaultW)
    assert(!out(1).getBoolean(3)) // negative evidence → pred false
    // empty text splits to [""], which scoring drops exactly like
    // training does: n=0, score = bias alone
    assert(out(2).getInt(1) === 0)
    assert(out(2).getLong(2) === m.bias)
  }

  test("unbalanced classes shift the prior bias") {
    val extra = labeled.union(
      Seq((5L, "the owl hid", true)).toDF("doc_id", "text", "y"))
    val m = Classifier.train(extra, "text", "y", maxVocab = 100)
    assert(m.bias === q(4.0 / 3)) // (3+1)/(2+1)
  }
}
