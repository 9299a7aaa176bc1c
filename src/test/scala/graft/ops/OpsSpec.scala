package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("regexSplitter splits a line into named fields, dropping the input") {
    // RegexSplitter(new Fields("num","lower","upper"), " ") —
    // MultiFamilyHBaseTest.java:54-55
    val df = Seq("1 a A", "2 b B").toDF("line")
    val out = Ops.regexSplitter("line", " ", Seq("num", "lower", "upper"))(df)
    assert(out.columns.toSeq === Seq("num", "lower", "upper"))
    assert(out.orderBy("num").as[(String, String, String)].collect() ===
      Array(("1", "a", "A"), ("2", "b", "B")))
  }

  test("expressionFunction appends a computed field") {
    // ExpressionFunction analog — MultiFamilyCascadeHBaseTest.java:62
    val df = Seq(1L, 2L).toDF("x")
    val out = Ops.expressionFunction("y", "x * 10 + 1")(df)
    assert(out.orderBy("x").as[(Long, Long)].collect() ===
      Array((1L, 11L), (2L, 21L)))
  }

  test("utf8 encode/decode round trip (the reference's bytes<->string boundary)") {
    val df = Seq("héllo", "wörld").toDF("s")
    val bytes = Ops.encodeUtf8("s")(df)
    assert(bytes.schema("s").dataType.typeName === "binary")
    val back = Ops.decodeUtf8("s")(bytes)
    assert(back.orderBy("s").as[String].collect() === Array("héllo", "wörld"))
  }

  test("retain / discard / rename / pipe compose") {
    val df = Seq((1, "a", true)).toDF("x", "y", "z")
    val out = Ops.pipe(
      Ops.retain("x", "y"),
      Ops.rename("y", "label"),
      Ops.expressionFunction("x2", "x * 2"))(df)
    assert(out.columns.toSeq === Seq("x", "label", "x2"))
    assert(Ops.discard("label")(out).columns.toSeq === Seq("x", "x2"))
  }
}
