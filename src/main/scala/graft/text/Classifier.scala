package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Linear bag-of-words text classifier trained with Naive-Bayes
  * log-count ratios (Wang & Manning, ACL 2012 — the strong baseline
  * fastText reduces to for bag-of-words features), the trained-filter
  * step of published corpus-curation pipelines (language-ID and
  * reference-vs-crawl quality models): fit a tiny linear model on a
  * labeled slice, then score the whole corpus with one cheap pass.
  *
  * Built so the LOSSY statistical score survives a hash-level oracle
  * gate, the same way [[Lm]] does:
  *
  *  - The corpus-sized training work is ONE distributed token-count
  *    pass with both class counts as conditional sums — a partial-agg
  *    shuffle that collapses to vocabulary cardinality map-side. At
  *    100 TB that is the only full scan training costs.
  *  - The model is BOUNDED driver state: top `maxVocab` tokens by
  *    total frequency (deterministic lexicographic tiebreak). Tokens
  *    pruned or unseen score through the smoothing-only default weight
  *    log((cNeg+V)/(cPos+V)) — absence from the weight table IS the
  *    out-of-vocabulary path, identically on both engines.
  *  - Every logarithm is computed ONCE driver-side from exact integer
  *    counts and quantized to integer micro-logits; scoring is then
  *    pure integer join+sum, so no cross-engine float divergence is
  *    possible and the gate can assert the score value-level.
  */
object Classifier {

  /** Trained model: per-token micro-logit weights, the OOV default
    * weight, and the class-prior bias — all integer micro-logits. */
  case class NbModel(weights: Seq[(String, Long)], defaultW: Long,
                     bias: Long)

  /** Fit NB log-count-ratio weights on `docs` with boolean `labelCol`:
    * w(t) = log((cPos(t)+1)/(NPos+V)) - log((cNeg(t)+1)/(NNeg+V)),
    * bias = log((DPos+1)/(DNeg+1)), quantized to micro-logits. The
    * count pass aggregates both classes at once (conditional sums), so
    * training scans the corpus exactly once; everything after the
    * top-`maxVocab` collect is O(vocab) driver arithmetic. */
  def train(docs: DataFrame, textCol: String, labelCol: String,
            maxVocab: Int): NbModel = {
    val toks = split(col(textCol), " ")
    val counts = docs
      .select(col(labelCol).as("y"), explode(toks).as("t"))
      .filter(col("t") =!= "")
      .groupBy(col("t"))
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("cp"),
        sum(when(col("y"), 0L).otherwise(1L)).as("cn"))
    // pruning must not shift the smoothing denominators: totals and the
    // vocabulary size come from the FULL count table (bounded: one row
    // per distinct token, already collapsed map-side)
    val tot = counts.agg(sum(col("cp")), sum(col("cn")), count(lit(1)))
      .head()
    val (nPos, nNeg, vocab) =
      (tot.getLong(0), tot.getLong(1), tot.getLong(2))
    val kept = counts
      .orderBy((col("cp") + col("cn")).desc, col("t"))
      .limit(maxVocab).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val dCounts = docs.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)),
      sum(when(col(labelCol), 0L).otherwise(1L))).head()
    def q(p: Double): Long = math.round(1e6 * math.log(p))
    def w(cp: Long, cn: Long): Long =
      q((cp + 1).toDouble / (nPos + vocab)) -
        q((cn + 1).toDouble / (nNeg + vocab))
    NbModel(
      kept.toSeq.sortBy(_._1).map { case (t, cp, cn) => (t, w(cp, cn)) },
      defaultW = w(0L, 0L),
      bias = q((dCounts.getLong(0) + 1).toDouble /
        (dCounts.getLong(1) + 1)))
  }

  /** Score documents: (doc_id, n_tokens, score_micro, pred) where
    * score_micro = bias + Σ_tokens w(token) in micro-logits and pred =
    * score_micro >= 0. One explode + per-doc partial agg over distinct
    * (doc, token) counts, one broadcast join against the bounded
    * weight table — the shuffle carries per-doc DISTINCT token counts,
    * not token positions, and the corpus scans once. Empty tokens are
    * dropped, matching [[train]]'s tokenization exactly (train/score
    * disagreeing on `""` would score a weight no training count ever
    * produced), so an all-whitespace document scores (0, bias). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: NbModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wtab = broadcast(model.weights.toDF("t", "w"))
    val perDoc = docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("t"))
      .filter(col("t") =!= "")
      .groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("cnt"))
      .join(wtab, Seq("t"), "left")
      .withColumn("wx", coalesce(col("w"), lit(model.defaultW)))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).cast("int").as("n_tokens"),
        sum(col("cnt") * col("wx")).as("s"))
    docs.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0)).cast("int").as("n_tokens"),
        (coalesce(col("s"), lit(0L)) + model.bias).cast("bigint")
          .as("score_micro"))
      .withColumn("pred", col("score_micro") >= 0)
  }
}
