package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import graft.SparkSpec
import graft.dedup.Dedup
import graft.functions.{Native, SubstrFingerprints}

/** Rolling Rabin-Karp window-fingerprint contract: the O(n) rolling
  * recurrence equals the naive nested-Horner definition (which the
  * DuckDB oracle mirrors) in both the codegen and interpreted paths,
  * and the ExactSubstr statistics match a hand computation where
  * overlapping duplicated windows must merge.
  */
class RollingFpSpec extends SparkSpec {
  import spark.implicits._

  private val P = Native.P

  /** The definition: fp(i) = horner31 * P + horner37 over k values. */
  private def naive(th: Array[Long], k: Int): Array[Long] = {
    if (th.length < k) return Array.emptyLongArray
    Array.tabulate(th.length - k + 1) { i =>
      def horner(b: Long): Long =
        (i until i + k).foldLeft(0L)((h, j) => (h * b + th(j)) % P)
      horner(31) * P + horner(37)
    }
  }

  test("rolling == nested Horner on seeded random arrays (codegen path)") {
    val rnd = new scala.util.Random(42)
    val arrays = Seq.tabulate(60)(i =>
      (i.toLong, Array.fill(rnd.nextInt(50))(rnd.nextLong(P))))
    val df = arrays.map { case (id, a) => (id, a.toSeq) }.toDF("id", "th")
    val got = df.select(col("id"), Native.substrFingerprints(col("th"), 16))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toMap
    arrays.foreach { case (id, a) =>
      assert(got(id).toSeq === naive(a, 16).toSeq, s"id=$id len=${a.length}")
    }
  }

  test("interpreted eval matches codegen and the definition") {
    val rnd = new scala.util.Random(7)
    val a = Array.fill(40)(rnd.nextLong(P))
    val expr = SubstrFingerprints(
      Literal.create(a.toSeq, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, containsNull = false)),
      Literal(16))
    val out = expr.eval().asInstanceOf[ArrayData].toLongArray()
    assert(out.toSeq === naive(a, 16).toSeq)
  }

  test("docs shorter than k yield no windows") {
    val df = Seq((1L, Seq.fill(15)(3L))).toDF("id", "th")
    val got = df.select(Native.substrFingerprints(col("th"), 16))
      .head().getSeq[Long](0)
    assert(got.isEmpty)
  }

  test("substrDupStats merges overlapping duplicated spans (hand case)") {
    // k=3; d1 and d2 share the windows "a b c" and "b c d" at offset
    // 1: each doc's two duplicated windows overlap in 2 tokens, so the
    // union is 4 tokens, not 6
    val docs = Seq((1L, "a b c d e"), (2L, "x a b c d"), (3L, "q r s"))
      .toDF("doc_id", "text")
    val out = Dedup.substrDupStats(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
    // (doc_id, n_tokens, n_windows, n_dup_windows, n_dup_tokens, keep)
    assert(out(0).toSeq === Seq(1L, 5, 3, 2, 4L, false))
    assert(out(1).toSeq === Seq(2L, 5, 3, 2, 4L, false))
    assert(out(2).toSeq === Seq(3L, 3, 1, 0, 0L, true))
  }

  /** Aligned-chunk definition: plain Horner per stride-k chunk, the
    * last chunk short. */
  private def naiveChunks(th: Array[Long], k: Int): Array[Long] =
    th.grouped(k).map { c =>
      def horner(b: Long): Long = c.foldLeft(0L)((h, v) => (h * b + v) % P)
      horner(31) * P + horner(37)
    }.toArray

  test("aligned chunk fps == per-chunk Horner, short tail included " +
      "(codegen + interpreted)") {
    val rnd = new scala.util.Random(11)
    // lengths straddling the k boundary: 0-token arrays cannot occur
    // (split always yields >= 1), but exact multiples and k-1/k+1 do
    val arrays = Seq(1, 15, 16, 17, 31, 32, 33, 50).zipWithIndex.map {
      case (len, i) => (i.toLong, Array.fill(len)(rnd.nextLong(P)))
    }
    val df = arrays.map { case (id, a) => (id, a.toSeq) }.toDF("id", "th")
    val got = df.select(col("id"), Native.chunkFingerprints(col("th"), 16))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toMap
    arrays.foreach { case (id, a) =>
      assert(got(id).toSeq === naiveChunks(a, 16).toSeq,
        s"id=$id len=${a.length}")
    }
    val expr = graft.functions.AlignedChunkFingerprints(
      Literal.create(arrays.last._2.toSeq,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = false)),
      Literal(16))
    assert(expr.eval().asInstanceOf[ArrayData].toLongArray().toSeq ===
      naiveChunks(arrays.last._2, 16).toSeq)
  }

  test("passageDedupStats: first occurrence wins, stats by hand") {
    // k=4 chunks; d2 repeats d1's first passage exactly; d3 is clean
    val docs = Seq(
      (1L, "a b c d e f"),      // chunks: [a b c d], [e f] (ctoks 2)
      (2L, "a b c d x y z w"),  // chunk 1 duplicates d1's first
      (3L, "q r s")).toDF("doc_id", "text")
    val out = Dedup.passageDedupStats(docs, "doc_id", "text", 4)
      .orderBy("doc_id").collect()
    // (doc_id, n_chunks, n_dup_chunks, kept_tokens)
    assert(out(0).toSeq === Seq(1L, 2, 0, 6L))
    assert(out(1).toSeq === Seq(2L, 2, 1, 4L))
    assert(out(2).toSeq === Seq(3L, 1, 0, 3L))
  }

  test("intra-document repeats count as duplicated windows") {
    // "a b a b a b": windows (k=3) = [aba, bab, aba, bab] — every
    // fingerprint occurs twice within the single doc
    val docs = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val out = Dedup.substrDupStats(docs, "doc_id", "text", k = 3)
      .head()
    assert(out.getInt(3) === 4)       // all 4 windows duplicated
    assert(out.getLong(4) === 6L)     // union covers the whole doc
    assert(!out.getBoolean(5))
  }
}
