package graft.ext

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._

/** Pins the r11 fused BPE application ([[graft.functions.Native.bpeStats]]
  * / BpeStatsExpr) BIT-equal to the original column composition
  * `Bpe.canonical` → `Bpe.applyMerges` → `Bpe.tokenCount` that the
  * DuckDB oracle mirrors — over adversarial fixed cases (slashes,
  * underscores, empty words, astral codepoints: the fallback path) and
  * random corpora with random merge tables (the fast path). */
object BpeFusedProps extends Properties("Bpe.fusedStats") {

  private lazy val spark = {
    val s = graft.TestSpark.spark
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def both(texts: Seq[String], merges: Seq[(String, String)])
      : Seq[((Int, Int), (Int, Int))] = {
    import spark.implicits._
    graft.functions.Native.register(spark)
    val df = texts.toDF("text")
    val toks = split(col("text"), " ")
    val orig = df
      .select(size(toks).cast("int").as("n_words"),
        graft.text.Bpe.applyMerges(
          graft.text.Bpe.canonical(col("text")), merges).as("m"))
      .select(col("n_words"),
        graft.text.Bpe.tokenCount(col("m"), col("n_words"))
          .as("n_bpe_tokens"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    val fusedCol = graft.functions.Native.bpeStats(col("text"),
      lit(merges.map(_._1).toArray), lit(merges.map(_._2).toArray))
    val fused = graft.ops.Ops.materializedColumn(df, "bs", fusedCol)
      .select(col("bs.n_words"), col("bs.n_bpe_tokens"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    orig.zip(fused)
  }

  property("fixed adversarial cases (incl. fallback path)") = Prop {
    val merges = Seq(("a", "b"), ("ab", "c"), ("_", "_"), ("c", "_"),
      ("x", "x"), ("/", "a"))
    val texts = Seq(
      "", " ", "  ", "abc abc", "aab abab ababab", "xxxxx xxxx",
      "ab/cd a/b", "///", "a_b c_", "_ __ ___", "abc_ _abc",
      "café ab", "a😀b abc", "😀", "ab c_ ",
      " leading and trailing ", "ababababababababababababababab")
    both(texts, merges).forall { case (o, f) => o == f }
  }

  private val symGen = Gen.oneOf("a", "b", "c", "_", "d")
  private val mergesGen = Gen.listOfN(8, Gen.zip(symGen, symGen))
  private val charGen = Gen.frequency(
    8 -> Gen.oneOf('a', 'b', 'c', 'd'), 3 -> Gen.const(' '),
    1 -> Gen.const('_'), 1 -> Gen.const('/'), 1 -> Gen.const('é'))
  private val textGen = Gen.listOf(charGen).map(_.mkString)

  property("random corpora with random merge tables (fast + fallback)") =
    Prop.forAll(Gen.listOfN(10, textGen), mergesGen) {
      (texts: List[String], merges: List[(String, String)]) =>
        // composite second-order merge of the first pair, like a real
        // trained table
        val m2 = merges ++ merges.headOption.map { case (l, r) => (l + r, l) }
        both(texts, m2).forall { case (o, f) => o == f }
    }
}
