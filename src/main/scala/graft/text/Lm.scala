package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pruned bigram language model — the perplexity-filter step of
  * published web-corpus curation pipelines (train a small LM on a
  * reference corpus, score candidate documents, filter by per-token
  * log-probability), built so the hash-level oracle gate can check the
  * LOSSY statistical score exactly:
  *
  *  - The corpus-sized work is distributed: one bigram-count pass and
  *    one history-count pass, both partial-agg shuffles that collapse
  *    to (observed-bigram, vocabulary) cardinality map-side.
  *  - The model is BOUNDED driver state in BOTH tables: top
  *    `maxBigrams` bigrams and top `maxHistories` histories by
  *    frequency (deterministic lexicographic tiebreaks) — the classic
  *    pruned-LM shape; everything pruned or unseen scores through the
  *    per-history add-one backoff (or, for a pruned history, the
  *    ln(1/V) floor), identically on both engines because absence
  *    from the model table IS the backoff trigger.
  *  - Every logarithm is computed ONCE, driver-side, and quantized to
  *    integer micro-nats. Scoring is then pure integer join+sum
  *    arithmetic — no cross-engine float divergence is possible, which
  *    is what lets a statistical score live under a hash gate.
  */
object Lm {

  /** Trained model: bigram log-probs, per-history backoff log-probs,
    * and the unseen-history floor — all integer micro-nats. */
  case class BigramModel(bigrams: Seq[(String, String, Long)],
                         histories: Seq[(String, Long)],
                         floorLp: Long) {
    def bigramMap: Map[(String, String), Long] =
      bigrams.map { case (a, b, lp) => ((a, b), lp) }.toMap
    def historyMap: Map[String, Long] = histories.map(h => (h._1, h._2)).toMap
  }

  /** Per-position bigram rows of `docs`: (doc_id, w1, w2) for every
    * adjacent token pair. Deliberately NOT a higher-order-function
    * lambda building struct arrays — HOF lambdas drop out of
    * whole-stage codegen and made this pass the family's slowest
    * (3.5s → 0.9s at sf0.1 for the same rows). `posexplode` over the
    * all-but-last slice plus one `element_at` for the successor stays
    * inside codegen end-to-end; documents with < 2 tokens generate
    * nothing (slice length clamps to 0, never negative). */
  def bigramRows(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    docs
      .select(col(idCol).as("doc_id"), toks.as("t"))
      .select(col("doc_id"), col("t"),
        posexplode(slice(col("t"), lit(1),
          greatest(size(col("t")) - 1, lit(0)))))
      .select(col("doc_id"), col("col").as("w1"),
        element_at(col("t"), col("pos") + 2).as("w2"))
  }

  /** Train on `docs.textCol`: add-one-smoothed bigram probabilities
    * p(w2|w1) = (c(w1,w2)+1) / (c(w1·)+V), quantized to micro-nats.
    * Backoff for a pruned/unseen bigram with a known history is the
    * same formula at c=0; an unseen OR PRUNED history scores ln(1/V).
    *
    * BOTH model tables are bounded driver state. Bigrams: top
    * `maxBigrams` by frequency. Histories: top `maxHistories` by
    * frequency (lexicographic tiebreak) — on a real web corpus the
    * history table is the Heaps-law vocabulary (10⁸+ types at 100 TB),
    * so an uncapped collect is a driver OOM waiting at scale. A pruned
    * history scores through the unseen-history floor ln(1/V) — the
    * standard pruned-backoff trade: rare histories carry little
    * probability mass, and the floor 1/V differs from a rare pruned
    * history's true backoff 1/(hn+V) by at most the (tiny, bounded by
    * the pruning frequency threshold) hn of a history that did not
    * make the top-N cut. The bigram denominators c(w1·) are computed
    * DISTRIBUTED (a join against the full history-count table, never
    * collected), so history pruning cannot shift any kept bigram's
    * probability. LmSpec pins the pruned-history backoff value-level. */
  def train(docs: DataFrame, textCol: String, maxBigrams: Int,
            maxHistories: Int = 200000): BigramModel = {
    val toks = split(col(textCol), " ")
    val pairs = bigramRows(
      docs.select(lit(0L).as("__id"), col(textCol)), "__id", textCol)
      .select(col("w1"), col("w2"))
    val bg = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("n"))
    // history counts over the FULL bigram set (pruning must not shift
    // the kept bigrams' denominators) — stays a DataFrame; only
    // bounded tops are ever collected
    val histDf = pairs.groupBy("w1").agg(count(lit(1)).as("hn"))
    val vocab = docs.select(explode(toks).as("w")).filter(col("w") =!= "")
      .agg(countDistinct(col("w"))).head().getLong(0)
    // each kept bigram rides with its own history total via the join —
    // O(maxBigrams) driver rows, full denominators
    val kept = bg.join(histDf, Seq("w1"))
      .orderBy(col("n").desc, col("w1"), col("w2"))
      .limit(maxBigrams).collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    val keptHist = histDf.orderBy(col("hn").desc, col("w1"))
      .limit(maxHistories).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def q(p: Double): Long = math.round(1e6 * math.log(p))
    val bigrams = kept.toSeq.map { case (w1, w2, n, hn) =>
      (w1, w2, q((n + 1).toDouble / (hn + vocab)))
    }
    val histories = keptHist.toSeq.sortBy(_._1).map { case (w1, hn) =>
      (w1, q(1.0 / (hn + vocab)))
    }
    BigramModel(bigrams, histories, q(1.0 / vocab))
  }

  /** Score documents with a trained model: (doc_id, n_bigrams,
    * lp_micro) where lp_micro is the summed micro-nat log-probability.
    * One explode + per-doc partial agg, two broadcast joins against
    * the bounded model — the shuffle carries per-doc DISTINCT bigram
    * counts, not positions. Documents with < 2 tokens score (0, 0). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: BigramModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bgm = broadcast(model.bigrams.toDF("w1", "w2", "lp"))
    val hm = broadcast(model.histories.toDF("w1", "lp0"))
    val perDoc = bigramRows(docs, idCol, textCol)
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
      .join(bgm, Seq("w1", "w2"), "left")
      .join(hm, Seq("w1"), "left")
      .withColumn("lpx", coalesce(col("lp"), col("lp0"), lit(model.floorLp)))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).cast("int").as("n_bigrams"),
        sum(col("cnt") * col("lpx")).cast("bigint").as("lp_micro"))
    docs.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0)).cast("int").as("n_bigrams"),
        coalesce(col("lp_micro"), lit(0L)).cast("bigint").as("lp_micro"))
  }
}
