package graft.ext

import graft.SparkSpec
import graft.functions.Native
import org.apache.spark.sql.functions._

/** Pins for the codegen'd Bloom-probe expression (BloomMightContain):
  * the sketch contract (NO false negatives — every inserted key
  * probes true), identical answers under whole-stage codegen and
  * interpreted eval, null-key propagation, and the analysis-time
  * rejection of a non-literal filter argument (a per-row filter would
  * silently bind to a null input row). */
class BloomExprSpec extends SparkSpec {

  private def serialized(keys: Seq[Long]): Array[Byte] = {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(
      keys.length.max(1), 0.03)
    keys.foreach(bf.putLong)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  test("no false negatives: every inserted key probes true; disjoint " +
      "keys mostly false (fpp-bounded)") {
    import spark.implicits._
    val inserted = (0L until 500L).map(_ * 7 + 3)
    val bytes = serialized(inserted)
    val probes = spark.range(10000).toDF("k")
    val got = probes
      .withColumn("hit", Native.bloomMightContain(lit(bytes), col("k")))
      .as[(Long, Boolean)].collect().toMap
    inserted.filter(_ < 10000).foreach { k =>
      assert(got(k), s"false negative for inserted key $k")
    }
    val absent = (0L until 10000L).filterNot(inserted.contains)
    val fp = absent.count(got(_))
    assert(fp.toDouble / absent.size < 0.10,
      s"false-positive rate implausibly high: $fp/${absent.size}")
  }

  test("codegen and interpreted eval agree (the expression runs inside " +
      "WholeStageCodegen in the real plan)") {
    import spark.implicits._
    val bytes = serialized(Seq(1L, 42L, 9999L))
    val df = Seq(Some(1L), Some(2L), Some(42L), None, Some(9999L))
      .toDF("k")
      .select(col("k"),
        Native.bloomMightContain(lit(bytes), col("k")).as("hit"))
    val rows = df.collect().map(r =>
      (if (r.isNullAt(0)) null else r.getLong(0),
       if (r.isNullAt(1)) null else r.getBoolean(1))).toSeq
    assert(rows.contains((1L, true)) && rows.contains((42L, true)) &&
      rows.contains((9999L, true)))
    // null key -> null result (BinaryExpression null semantics)
    assert(rows.contains((null, null)))
    // interpreted path agrees
    val e = graft.functions.BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(bytes),
      org.apache.spark.sql.catalyst.expressions.Literal(42L))
    assert(e.eval(null) == true)
  }

  test("a non-foldable filter argument is rejected at analysis") {
    import spark.implicits._
    val df = Seq((Array[Byte](1, 2), 1L)).toDF("bf", "k")
    val ex = intercept[Exception] {
      df.select(Native.bloomMightContain(col("bf"), col("k"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("foldable") ||
      ex.getMessage.toLowerCase.contains("literal"), ex.getMessage)
  }
}
