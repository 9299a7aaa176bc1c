package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** Session-extension entry point: makes the engine's native functions
  * available in ANY session started with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), without per-session
  * registration calls. The same builders back
  * [[graft.functions.Native.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", name, usage)

  private val fns: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_token_hashes", "md5-derived 60-bit hash mod P per array element",
      es => TokenHashes60(es.head)),
    ("graft_token_hashes_raw", "raw 60-bit md5 hash per array element (no mod)",
      es => TokenHashesRaw60(es.head)),
    ("graft_shingle_hashes", "base-31 n-gram rolls over token hashes",
      es => PolyShingleHashes(es(0), es(1))),
    ("graft_minhash_sig", "k-permutation MinHash signature",
      es => MinHashSig(es(0), es(1))),
    ("graft_simhash64", "64-bit SimHash fingerprint of token hashes",
      es => SimHash64Expr(es.head)),
    ("graft_hyperplane_sig", "angular-LSH hyperplane sign bits",
      es => HyperplaneSigExpr(es(0), es(1),
        if (es.length > 2) es(2)
        else org.apache.spark.sql.catalyst.expressions.Literal(0))),
    ("graft_cosine_q", "cosine similarity of quantized integer vectors",
      es => CosineQExpr(es(0), es(1))),
    ("graft_word_shingles", "word n-gram shingles joined by spaces",
      es => WordShinglesExpr(es(0), es(1))))

  override def apply(ext: SparkSessionExtensions): Unit =
    fns.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
}
