package graft.flow

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.{SparkSpec, TestSpark}
import graft.kv.{KvSchema, KvTable, SinkMode}
import graft.ops.Ops

/** Full reproductions of the reference's three entry points (SURVEY.md
  * §3) through the engine's own surfaces: text-line source, pipe ops,
  * KV sink/source, Cascade ordering — asserting VALUES, not just the
  * reference's row counts.
  */
class CascadeE2ESpec extends SparkSpec {
  import spark.implicits._

  val fixture: Seq[String] = Seq(
    "1 a A", "1 b B", "1 c C", "2 b B", "2 c C", "2 d D", "3 c C",
    "4 b B", "4 c C", "4 d D", "5 a A", "5 b B", "5 e E")

  val schema: KvSchema = KvSchema.of("num",
    "lower" -> ("left", "lower"), "upper" -> ("right", "upper"))

  private def writeFixture(): String = {
    val dir = TestSpark.scratch("cascade-fixture")
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(s"$dir/small.txt"),
      fixture.mkString("\n").getBytes("UTF-8"))
    s"$dir/small.txt"
  }

  test("EP1+EP2: file -> parse -> KV upsert -> identity -> file round trip") {
    // MultiFamilyHBaseTest.java:50-85: 13 lines -> 5 rows -> 5 lines.
    val file = writeFixture()
    val tablePath = TestSpark.scratch("cascade-table")
    val outDir = TestSpark.scratch("cascade-out")

    // EP1: Lfs(TextLine) source -> Each(RegexSplitter) -> HBaseTap REPLACE
    val lines = spark.read.text(file).coalesce(1) // (value) like TextLine's line
    val parsed = Ops.pipe(
      Ops.regexSplitter("value", " ", Seq("num", "lower", "upper")))(lines)
    KvTable.write(parsed, tablePath, schema, SinkMode.Replace)
    assert(KvTable.read(spark, tablePath).count() === 5)

    // EP2: HBaseTap source -> Each(Identity) -> TextLine sink
    val copied = Ops.identity(KvTable.read(spark, tablePath))
    copied.select(concat_ws(" ", col("num"), col("lower"), col("upper"))
        .as("value"))
      .coalesce(1).write.mode("overwrite").text(outDir)

    val back = spark.read.text(outDir).as[String].collect().sorted
    assert(back.length === 5)
    assert(back === Array("1 c C", "2 d D", "3 c C", "4 d D", "5 e E"))
  }

  test("EP3: cascade orders flows by tap identity; APPEND re-run doubles the log") {
    // MultiFamilyCascadeHBaseTest.java:56-105 with deterministic keys.
    val file = writeFixture()
    val tablePath = TestSpark.scratch("cascade3-table")
    val outDir = TestSpark.scratch("cascade3-out")

    def parseFlow(run: Int) = Flow("parse", Set("small.txt"), Set("kvtable"))(
      () => {
        val lines = spark.read.text(file).coalesce(1)
        val parsed = Ops.pipe(
          Ops.regexSplitter("value", " ", Seq("num", "lower", "upper")),
          // ExpressionFunction appending a unique synthetic key
          // (deterministic analog of the reference's random int,
          // MultiFamilyCascadeHBaseTest.java:62).
          Ops.expressionFunction("num",
            s"concat('r$run-', num, '-', lower, '-', upper)"))(lines)
        KvTable.write(parsed, tablePath, schema, SinkMode.Append)
      })

    def copyFlow() = Flow("copy", Set("kvtable"), Set("outfile"))(
      () => KvTable.read(spark, tablePath)
        .select(concat_ws(" ", col("num"), col("lower"), col("upper")).as("value"))
        .coalesce(1).write.mode("overwrite").text(outDir))

    // Registration REVERSED on purpose (copy before parse) — the cascade
    // must still run parse first (reference comment at :83,:97).
    val order1 = new Cascade(Seq(copyFlow(), parseFlow(1))).complete()
    assert(order1 === Seq("parse", "copy"))
    assert(spark.read.text(outDir).count() === 13)

    // APPEND re-run accumulates: 13 -> 26 (unique keys per run).
    new Cascade(Seq(copyFlow(), parseFlow(2))).complete()
    assert(spark.read.text(outDir).count() === 26)

    // deleteSinks pre-run drop (MultiFamilyCascadeHBaseTest.java:85):
    // instead of accumulating to 39, the re-run starts clean -> 13.
    val dropper: String => Unit = {
      case "kvtable" => KvTable.drop(spark, tablePath)
      case _ => () // text sink is overwrite-mode already
    }
    new Cascade(Seq(copyFlow(), parseFlow(3)), Some(dropper))
      .complete(deleteSinks = true)
    assert(spark.read.text(outDir).count() === 13)
    // without a dropper configured, deleteSinks refuses loudly
    intercept[IllegalStateException] {
      new Cascade(Seq(parseFlow(4))).complete(deleteSinks = true)
    }
  }
}
