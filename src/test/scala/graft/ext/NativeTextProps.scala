package graft.ext

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.unsafe.types.UTF8String

/** ScalaCheck properties for the fused native text passes
  * ([[graft.functions.Native.gopherStatsEval]] /
  * [[graft.functions.Native.tokenStatsEval]] /
  * [[graft.functions.Native.langScoresEval]]) against a trivial
  * driver-side reference model built from Java's own
  * `trim` + `split("\\s+", -1)` + string-joined n-grams — the same
  * semantics the HOF formulations (and the DuckDB oracle) compute.
  * Randomized inputs guard the token-interning / packed-id gram
  * counting against collision and edge-case bugs the fixed adversarial
  * spec lists can't cover. Pure JVM — no Spark session.
  */
object NativeTextProps extends Properties("Native.textPasses") {

  // Small alphabet + explicit whitespace so duplicates, empty fields
  // and repeated grams appear constantly; include multi-byte chars so
  // codepoint counting is exercised.
  private val genText: Gen[String] =
    Gen.listOf(Gen.frequency(
      6 -> Gen.oneOf("a", "b", "ab", "ba", "é", "日", "x1"),
      3 -> Gen.oneOf(" ", "\t", "\n", "  "),
      1 -> Gen.oneOf("", "\r", "\f", "")))
      .map(_.mkString)

  // reference model: Spark's trim strips 0x20 only; Java split keeps
  // leading/trailing empty fields with limit -1; "" splits to [""]
  private def refTokens(text: String): Array[String] = {
    var lo = 0
    var hi = text.length
    while (lo < hi && text.charAt(lo) == ' ') lo += 1
    while (hi > lo && text.charAt(hi - 1) == ' ') hi -= 1
    text.substring(lo, hi).split("\\s+", -1)
  }

  private def grams(toks: Array[String], n: Int): Array[String] =
    if (toks.length < n) Array.empty
    else (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" ")).toArray

  private def topFrac(gs: Array[String]): Double =
    if (gs.isEmpty) 0.0
    else gs.groupBy(identity).values.map(_.length).max.toDouble / gs.length

  private def dupFrac(gs: Array[String]): Double =
    if (gs.isEmpty) 0.0 else (gs.length - gs.distinct.length).toDouble / gs.length

  property("gopherStatsEval matches the string-model metrics") =
    org.scalacheck.Prop.forAll(genText) { text =>
      val row = graft.functions.Native.gopherStatsEval(UTF8String.fromString(text))
      val t = refTokens(text)
      val bg = grams(t, 2)
      val tg = grams(t, 3)
      val ok = row.getInt(0) == t.length &&
        row.getDouble(1) == dupFrac(t) &&
        row.getDouble(2) == topFrac(bg) &&
        row.getDouble(3) == dupFrac(bg) &&
        row.getDouble(4) == topFrac(tg)
      ok :| s"text=${text.replace("\n", "\\n")} got=(${row.getInt(0)}," +
        s"${row.getDouble(1)},${row.getDouble(2)},${row.getDouble(3)}," +
        s"${row.getDouble(4)}) want=(${t.length},${dupFrac(t)},${topFrac(bg)}," +
        s"${dupFrac(bg)},${topFrac(tg)})"
    }

  property("tokenStatsEval matches token count + codepoint chars") =
    org.scalacheck.Prop.forAll(genText) { text =>
      val row = graft.functions.Native.tokenStatsEval(UTF8String.fromString(text))
      val t = refTokens(text)
      val wantChars = t.map(s => s.codePointCount(0, s.length).toLong).sum
      (row.getInt(0) == t.length && row.getLong(1) == wantChars) :|
        s"text=${text.replace("\n", "\\n")} got=(${row.getInt(0)},${row.getLong(1)}) " +
        s"want=(${t.length},$wantChars)"
    }

  property("tokenCountsEval matches first-occurrence-ordered token counts") =
    org.scalacheck.Prop.forAll(genText) { text =>
      val arr = graft.functions.Native.tokenCountsEval(UTF8String.fromString(text))
      val got = (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2)
        (r.getUTF8String(0).toString, r.getLong(1))
      }
      // reference: token -> count, keys in first-occurrence order —
      // the multiset explode(tokens)+groupBy(doc, token).count yields
      val want = {
        val m = new java.util.LinkedHashMap[String, Long]()
        refTokens(text).foreach(t => m.merge(t, 1L, (a, b) => a + b))
        import scala.jdk.CollectionConverters._
        // iterator, not entrySet().asScala: mapping over the Set view
        // would drop insertion order (and dedupe tuples)
        m.entrySet().iterator().asScala
          .map(e => (e.getKey, e.getValue.longValue())).toSeq
      }
      def hx(s: Seq[(String, Long)]): String = s.map { case (t, c) =>
        t.getBytes("UTF-8").map(b => f"$b%02x").mkString("") + ":" + c
      }.mkString(",")
      (got == want) :| s"text=${text.getBytes("UTF-8").map(b => f"$b%02x")
        .mkString("")} got=${hx(got)} want=${hx(want)}"
    }

  private val profiles: Seq[Seq[String]] =
    graft.text.TextOps.langProfiles.map(_._2)

  property("langScoresEval matches per-profile frequency counts") =
    org.scalacheck.Prop.forAll(genText, Gen.listOf(
        Gen.oneOf("the", "der", "el", "le", "a", "und", "es", "est"))) {
      (noise, hits) =>
        val text = (noise.split("\\s+").toList ++ hits)
          .mkString(" ") // interleave profile words with noise tokens
        val arr = graft.functions.Native.langScoresEval(
          UTF8String.fromString(text),
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            profiles.map(ws => new org.apache.spark.sql.catalyst.util.GenericArrayData(
              ws.map(UTF8String.fromString): Seq[Any]).asInstanceOf[Any])))
        val t = refTokens(text)
        val want = profiles.map(ws => t.count(ws.contains))
        val got = (0 until arr.numElements()).map(arr.getInt)
        (got == want) :| s"text=$text got=$got want=$want"
    }
}
