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

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    // The engine's answer to join skew at 100 TB where salting isn't
    // applied: a hot key (50k padded rows on key 0 vs ~10 rows/key
    // elsewhere) makes one shuffle partition dwarf the median; with
    // thresholds scaled to test size, AQE's OptimizeSkewedJoin must
    // split it into multiple sub-partition tasks — visible as
    // `skew=true` on the sort-merge join in the final adaptive plan.
    import org.apache.spark.sql.functions.{col, concat, lit, md5}
    val s = spark
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = keys.map { case (k, _) => k -> s.conf.getOption(k) }
    keys.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val fact = s.range(0, 50000)
        .select(lit(0L).as("k"),
          concat(md5(col("id").cast("string")),
            md5((col("id") + 1).cast("string"))).as("pad"))
        .union(s.range(0, 4000)
          .select((col("id") % 400 + 1).as("k"),
            md5(col("id").cast("string")).as("pad")))
      val dim = s.range(0, 401).select(col("id").as("k"),
        md5(col("id").cast("string")).as("name"))
      val joined = fact.join(dim, "k")
      assert(joined.collect().length === 54000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to split the hot partition:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
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
