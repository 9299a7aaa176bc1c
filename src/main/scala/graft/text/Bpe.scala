package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding TRAINER — the tokenizer-fitting step of an LLM
  * data pipeline (Sennrich et al. 2016's algorithm, the public BPE
  * everyone's tokenizers derive from), split the way a 100 TB corpus
  * forces:
  *
  *  - The DISTRIBUTED phase is one explode + partial-agg word-count
  *    pass — the only corpus-sized work. Map-side combine collapses it
  *    to vocabulary cardinality before the exchange, so the shuffle
  *    carries O(vocab), not O(tokens).
  *  - The DRIVER phase is the classic pair-count/merge loop over the
  *    bounded word-frequency dictionary (Heaps-law vocabulary, capped
  *    at `maxVocab` most-frequent words — the same bounded-model-state
  *    class as k-means centroids). Truncation is loud, never silent.
  *
  * Everything is deterministic: integer counts, ties broken
  * lexicographically, no floats anywhere — so the trained merge table
  * is a pure function of the corpus and can ride into a SQL oracle as
  * literals while the APPLICATION is recomputed independently.
  */
object Bpe {

  /** End-of-word marker appended to every word before splitting to
    * characters (must not occur in corpus words; the canonical form
    * separator '/' likewise). */
  val Eow = "_"

  /** Learn up to `merges` BPE merges. Returns (left, right) pairs in
    * rank order; may return fewer if the vocabulary runs out of
    * adjacent pairs. Pair counting follows the reference algorithm:
    * every adjacent symbol position counts (weighted by word
    * frequency); the merge step replaces left-to-right without
    * overlap. */
  def train(docs: DataFrame, textCol: String, merges: Int,
            maxVocab: Int): Seq[(String, String)] = {
    val wc = docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxVocab + 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    if (wc.length > maxVocab)
      throw new IllegalStateException(
        s"BPE vocabulary exceeds maxVocab=$maxVocab — raise the cap or " +
          "pre-normalize; refusing to train on a silently truncated vocab")
    var words: Array[(Array[String], Long)] =
      wc.map { case (w, n) => ((w + Eow).map(_.toString).toArray, n) }
    val out = Seq.newBuilder[(String, String)]
    var rank = 0
    var done = false
    while (rank < merges && !done) {
      val pc = collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pc.update(k, pc.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      if (pc.isEmpty) done = true
      else {
        val ((l, r), _) = pc.minBy { case ((l, r), n) => (-n, l, r) }
        words = words.map { case (syms, n) => (mergePair(syms, l, r), n) }
        out += ((l, r))
        rank += 1
      }
    }
    out.result()
  }

  /** One merge step on a symbol sequence: replace (l, r) adjacencies
    * left-to-right without overlap — the reference algorithm's merge,
    * and exactly `String.replace`'s semantics on the canonical form. */
  private[graft] def mergePair(syms: Array[String], l: String,
                               r: String): Array[String] = {
    val buf = collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        buf += (l + r); i += 2
      } else { buf += syms(i); i += 1 }
    }
    buf.toArray
  }

  /** Canonical '/'-delimited symbol form of a document: every word
    * becomes "/c/h/a/r/s/_/" (EOW marker included), words joined by a
    * space. Merges can never span words: the space between words is
    * not preceded by the separator pattern a merge replacement
    * matches. */
  def canonical(text: Column): Column =
    // split on the empty pattern = one element per char — 1.5× the
    // throughput of the regexp_replace("(.)", "$1/") formulation
    // (same output, verified over the corpus). Contract: BMP text
    // (surrogate pairs would split mid-codepoint); the corpora this
    // engine's text family targets are ASCII-tokenized upstream.
    array_join(transform(split(text, " "), w =>
      concat(lit("/"),
        array_join(split(concat(w, lit(Eow)), ""), "/"), lit("/"))), " ")

  /** Apply trained merges in rank order: each merge is a literal
    * left-to-right non-overlapping replacement "/l/r/" → "/lr/" on the
    * canonical form — exactly the trainer's merge step, whole-stage
    * codegen'd, and reproducible by ANY engine with LTR replace()
    * (the DuckDB oracle nests the identical replacements). */
  def applyMerges(canon: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(canon) { case (c, (l, r)) =>
      replace(c, lit(s"/$l/$r/"), lit(s"/$l$r/"))
    }

  /** Post-merge token count of a canonical-form document: each word
    * contributes (symbols + 1) slashes, so tokens = slashes − words. */
  def tokenCount(merged: Column, nWords: Column): Column =
    (length(merged) - length(replace(merged, lit("/"), lit(""))) - nWords)
      .cast("int")
}
