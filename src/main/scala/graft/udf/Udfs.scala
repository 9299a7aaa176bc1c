package graft.udf

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.{Encoder, Encoders}

/** The user-extension surface (SURVEY.md §2j): Cascading exposes
  * per-tuple `Function`s and `Aggregator`s; the engine maps them to
  * Spark scalar UDFs and typed Aggregators. Preference order remains
  * built-in functions > native Expression > these (scalar UDFs break
  * whole-stage codegen) — they exist for user logic that genuinely
  * cannot be expressed otherwise.
  */
object Udfs {

  /** Scalar UDF example (Each + Function analog): prefix of a string.
    * Deterministic, so it is still oracle-checkable. */
  val strPrefix: UserDefinedFunction =
    udf((s: String, n: Int) => if (s == null) null else s.take(n))

  /** Exact weighted average over (value, weight) with integer-cent
    * accumulation: sums are order-independent longs, so the result is
    * reproducible under any partitioning (a double-summing UDAF would
    * drift) — same discipline as the engine's DECIMAL aggregates.
    */
  case class WAvgBuf(cents: Long, weight: Long)

  object WeightedAvgCents extends Aggregator[(Double, Double), WAvgBuf, Double] {
    override def zero: WAvgBuf = WAvgBuf(0L, 0L)
    override def reduce(b: WAvgBuf, a: (Double, Double)): WAvgBuf =
      WAvgBuf(b.cents + math.round(a._1 * 100) * math.round(a._2),
        b.weight + math.round(a._2))
    override def merge(x: WAvgBuf, y: WAvgBuf): WAvgBuf =
      WAvgBuf(x.cents + y.cents, x.weight + y.weight)
    override def finish(b: WAvgBuf): Double =
      if (b.weight == 0L) 0.0 else b.cents.toDouble / (100.0 * b.weight)
    override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column-usable UDAF built from the typed Aggregator. */
  val weightedAvg: UserDefinedFunction = udaf(WeightedAvgCents)
}
