package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (north-star EXT surface, SURVEY.md §2h). Everything is built from
  * codegen'd Catalyst expressions and higher-order array functions — no
  * UDFs, no shuffles: each operator is embarrassingly parallel per row,
  * so it scales linearly with input splits at 100 TB.
  */
object TextOps {

  /** Whitespace tokenization (the `RegexSplitter` lineage generalized). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word n-gram shingles joined by single spaces: ["a b c", "b c d", …].
    * Docs shorter than n tokens yield an empty array (sequence() would
    * otherwise count DOWN for a negative span). */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Fraction of gram occurrences taken by the single most frequent
    * gram — the Gopher-style "top n-gram fraction" repetition signal
    * (Rae et al. 2021 §A1.1 use the analogous character fraction). Pin
    * `grams` with [[graft.ops.Ops.materializedColumn]] before calling:
    * the expression references it several times. Per-row compute — no
    * explode, no shuffle: the max frequency comes from the native
    * [[graft.functions.Native.topFreq]] expression, ONE O(n) hash-count
    * pass inside whole-stage codegen (successor to the O(n log n)
    * sort-and-longest-run HOF chain, and to the naive
    * count-per-distinct scan that was quadratic on mostly-distinct
    * documents). Requires [[graft.functions.Native.register]] on the
    * session, like every native-expression consumer.
    */
  def topGramFrac(grams: Column): Column =
    when(size(grams) > 0,
      graft.functions.Native.topFreq(grams).cast("double") / size(grams))
      .otherwise(lit(0.0))

  /** Fraction of gram occurrences beyond each distinct gram's first —
    * Gopher's "duplicate n-gram fraction". Same per-row/no-shuffle
    * shape as [[topGramFrac]]. */
  def dupGramFrac(grams: Column): Column =
    when(size(grams) > 0,
      (size(grams) - size(array_distinct(grams))).cast("double") / size(grams))
      .otherwise(lit(0.0))

  /** Total characters across tokens (excludes whitespace). */
  def tokenChars(toks: Column): Column =
    aggregate(transform(toks, t => length(t).cast("long")), lit(0L), _ + _)

  /** Ratio of tokens found in `stopwords` (frequency, not distinct). */
  def stopwordRatio(toks: Column, stopwords: Seq[String]): Column = {
    val stops = array(stopwords.map(lit): _*)
    size(filter(toks, t => array_contains(stops, t))).cast("double") /
      size(toks)
  }

  /** Fraction of characters outside [a-z0-9 ] after lowercasing — a
    * punctuation/garbage signal for quality filtering. */
  def nonAlnumRatio(text: Column): Column =
    length(regexp_replace(lower(text), "[a-z0-9 ]", "")).cast("double") /
      length(text)

  /** Composite quality score in [0,1]: length credit × (1 - stopword
    * dominance) × (1 - garbage ratio). Deterministic double arithmetic.
    * Prefer [[qualityScoreToks]] with a PINNED token column when scoring
    * alongside other token stats — this overload re-tokenizes. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column =
    qualityScoreToks(tokens(text), text, stopwords)

  /** [[qualityScore]] over an already-computed token array (pin it
    * behind a generator barrier so the tokenize runs once per row). */
  def qualityScoreToks(toks: Column, text: Column,
                       stopwords: Seq[String]): Column =
    least(lit(1.0), size(toks).cast("double") / 100.0) *
      (lit(1.0) - stopwordRatio(toks, stopwords)) *
      (lit(1.0) - nonAlnumRatio(text))

  /** The whole quality-metric family — struct<n_tokens, stop_ratio,
    * nonalnum_ratio, quality> — as ONE fused native byte pass
    * ([[graft.functions.Native.textQualityEval]]), bit-identical to the
    * component formulations above. Pin the struct with
    * [[graft.ops.Ops.materializedColumn]] and select fields; requires
    * [[graft.functions.Native.register]] on the session. */
  def qualityMetrics(text: Column, stopwords: Seq[String]): Column =
    graft.functions.Native.textQuality(text, array(stopwords.map(lit): _*))

  /** The whole Gopher repetition-metric family — struct<n_tokens,
    * dup_token_frac, top_bigram_frac, dup_bigram_frac,
    * top_trigram_frac> — as ONE fused native byte pass
    * ([[graft.functions.Native.gopherStatsEval]]), bit-identical to the
    * component formulation (tokens + wordShingles(2/3) + dupGramFrac /
    * topGramFrac). Pin the struct with
    * [[graft.ops.Ops.materializedColumn]] and select fields; requires
    * [[graft.functions.Native.register]] on the session. */
  def gopherMetrics(text: Column): Column =
    graft.functions.Native.gopherStats(text)

  /** Token count + total token codepoints — struct<n_tokens,
    * total_chars> — as ONE fused native byte pass, bit-identical to
    * `size(tokens(text))` / [[tokenChars]]. Pin and select fields;
    * requires [[graft.functions.Native.register]]. */
  def tokenStatsFused(text: Column): Column =
    graft.functions.Native.tokenStats(text)

  /** All [[langProfiles]] scores — array<int> in profile order — as ONE
    * fused native tokenize pass, bit-identical to [[langScores]]'s
    * per-profile HOF walks. Pin the array and element_at the entries;
    * requires [[graft.functions.Native.register]]. */
  def langScoresFused(text: Column): Column =
    graft.functions.Native.langScores(text,
      array(langProfiles.map { case (_, ws) => array(ws.map(lit): _*) }: _*))

  /** Document fingerprint: md5 of the whitespace-normalized, lowercased
    * text. Identical docs (mod spacing/case) share a fingerprint —
    * the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** Language-ID by stopword-profile scoring: count tokens hitting each
    * language's tiny function-word list, pick the max with a fixed
    * priority tiebreak. An n-gram-free heuristic that needs no model
    * and stays in codegen.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "les", "et", "est", "une"))

  def langScores(toks: Column): Seq[(String, Column)] =
    langProfiles.map { case (lang, words) =>
      lang -> size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))
    }

  /** Lexicon scoring (sentiment-style, cf. "Large Scale Sentiment
    * Analysis on Twitter with Spark", EDBT 2016): sum of per-token
    * weights. For small lexicons a map-literal lookup beats an
    * explode + broadcast join (no row blowup, stays per-row local);
    * for lexicons too large to inline, switch to a broadcast join.
    */
  def lexiconScore(toks: Column, lexicon: Map[String, Int]): Column = {
    val m = map(lexicon.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    aggregate(toks, lit(0L),
      (acc, t) => acc + coalesce(element_at(m, t), lit(0)).cast("long"))
  }

  def langId(text: Column): Column =
    langIdFromScores(langScores(tokens(text)))

  /** Winner from per-profile score COLUMNS — pass pinned attributes
    * (not inline score expressions): `maxScore` is inlined once per
    * profile branch below, so inline scores would re-evaluate
    * O(profiles²) times, each re-tokenizing. */
  def langIdFromScores(scores: Seq[(String, Column)]): Column = {
    // First profile with the max score wins (stable priority order).
    val maxScore = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und"): Column) { case ((lang, s), els) =>
      when(s === maxScore && maxScore > 0, lit(lang)).otherwise(els)
    }
  }

  /** Okapi BM25 (k1=1.2, b=0.75) top-k retrieval for a fixed term
    * list — the whole-pipeline operator behind the `text_bm25` gate
    * query and the `graft_bm25` SQL table function. Per-term tf is a
    * LOCAL array count on each doc's own tokens (no per-token explode,
    * no (doc, token) shuffle); the corpus statistics (N, Σdl, per-term
    * df) collapse into ONE 1-row partial aggregate broadcast back via
    * cross join; the final top-k is TakeOrderedAndProject
    * (per-partition heads + driver merge — never a global sort). idf
    * is the log-free Robertson ratio (N−df+0.5)/(df+0.5) — a
    * deterministic BM25 VARIANT (per term the ratio is a monotone
    * transform of the log idf, but a monotone per-term transform does
    * not preserve the ranking of the multi-term SUM, so multi-term
    * rankings can differ from log-idf BM25); engine and oracle compute
    * the identical variant, and it keeps every op an exactly-rounded
    * IEEE +,·,/ both engines reproduce bit-for-bit (ln is not
    * correctly rounded cross-engine); scores
    * are floored to integer micro-units so the hash gate compares
    * integers. At 100 TB: two scans of a 2-column projection (stats,
    * then score) and a k-row result — scan-bound, embarrassingly
    * parallel. Output: (doc_id, tf0..tfN-1, dl, score_micro, rank). */
  def bm25TopK(docs: org.apache.spark.sql.DataFrame, idCol: String,
               textCol: String, terms: Seq[String], k: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.ops.Ops.materializedColumn
    require(terms.nonEmpty, "bm25TopK needs at least one term")
    // pin the token array: dl + one tf per term all read it (the
    // regex split is the per-row cost; the array filters are cheap)
    val toksed = materializedColumn(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("text")),
      "t", tokens(col("text")))
    val f = toksed.select(
      col("doc_id") +: size(col("t")).cast("long").as("dl") +:
        terms.indices.map(i =>
          size(filter(col("t"), x => x === terms(i))).cast("long")
            .as(s"tf$i")): _*)
    val aggs = sum(col("dl")).as("sumdl") +: count(lit(1)).as("n") +:
      terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val g = f.agg(aggs.head, aggs.tail: _*)
    val avgdl = col("sumdl").cast("double") / col("n").cast("double")
    def termScore(i: Int) = {
      val tf = col(s"tf$i").cast("double")
      val df = col(s"df$i").cast("double")
      val idf = (col("n").cast("double") - df + lit(0.5)) / (df + lit(0.5))
      idf * ((tf * lit(2.2)) /
        (tf + lit(1.2) * (lit(0.25) + lit(0.75) *
          (col("dl").cast("double") / avgdl))))
    }
    val score = terms.indices.map(termScore).reduce(_ + _)
    val top = f.crossJoin(broadcast(g))
      .filter(terms.indices.map(i => col(s"tf$i")).reduce(_ + _) > 0)
      .withColumn("score_micro", floor(score * lit(1000000.0)).cast("long"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("score_micro").desc, col("doc_id"))))
      .select(col("doc_id") +: terms.indices.map(i => col(s"tf$i")) ++:
        Seq(col("dl"), col("score_micro"), col("rank")): _*)
      .orderBy(col("rank"))
  }
}
