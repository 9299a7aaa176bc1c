package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SQL TABLE-function surface for the EXT operators — a real user
  * reaches an engine through SQL, so the pipeline operators that only
  * had a Scala entry point are also registered as table functions:
  *
  *   SELECT * FROM graft_bm25('<dir>/documents.parquet',
  *                            'merge vector slow', 20)
  *   SELECT * FROM graft_passage_dedup('<dir>/documents.parquet', 16)
  *
  * Each builder validates its LITERAL arguments at analysis time and
  * expands to the operator's logical plan (the same plan the
  * DataFrame entry point produces — one operator, two surfaces, so
  * physical shape and oracle results cannot drift between them).
  * Registered per-session by [[register]] and injected globally by
  * [[graft.GraftExtensions]], mirroring [[Native]]'s dual surface.
  */
object TableFns {

  private def litVal(e: Expression, what: String): Any = {
    require(e.foldable, s"graft table function: $what must be a literal")
    val v = e.eval(null)
    require(v != null, s"graft table function: $what must not be NULL")
    v
  }
  private def str(e: Expression, what: String): String =
    String.valueOf(litVal(e, what))
  private def int(e: Expression, what: String): Int =
    litVal(e, what) match {
      case n: java.lang.Number => n.intValue
      case other => other.toString.toInt
    }

  /** The registry both [[register]] and GraftExtensions consume. */
  private[graft] val fns: Seq[(String, Seq[Expression] => LogicalPlan)] = Seq(
    "graft_bm25" -> (es => {
      require(es.length == 3,
        "usage: graft_bm25(docsParquetPath, 'term term ...', k)")
      val s = SparkSession.active
      val terms = str(es(1), "terms").split("\\s+").toSeq.filter(_.nonEmpty)
      graft.text.TextOps.bm25TopK(
          s.read.parquet(str(es(0), "docsParquetPath")),
          "doc_id", "text", terms, int(es(2), "k"))
        .queryExecution.analyzed
    }),
    "graft_passage_dedup" -> (es => {
      require(es.length == 2,
        "usage: graft_passage_dedup(docsParquetPath, chunkTokens)")
      val s = SparkSession.active
      Native.register(s)
      graft.dedup.Dedup.passageDedupStats(
          s.read.parquet(str(es(0), "docsParquetPath")),
          "doc_id", "text", int(es(1), "chunkTokens"))
        .queryExecution.analyzed
    }))

  /** Idempotent per-session registration (the [[Native.register]]
    * pattern for the table-function registry). */
  def register(spark: SparkSession): Unit =
    fns.foreach { case (name, builder) =>
      spark.sessionState.tableFunctionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
