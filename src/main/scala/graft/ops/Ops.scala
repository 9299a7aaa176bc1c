package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Cascading pipe-assembly surface the reference's tests exercise
  * (`Each` + per-tuple functions), re-expressed as composable
  * `DataFrame => DataFrame` transforms. All of these stay inside
  * Catalyst/codegen — no Scala closures in the hot path.
  */
object Ops {

  /** Per-key row count above which an analytic window's partition is
    * adaptively CHUNKED along its order key (two-phase running window —
    * see q_window_funcs): below it, a key's history is one window
    * partition; above it, one serial task would sort and scan the whole
    * hot key. Sized to what one task handles comfortably at the test
    * scales; a production deployment tunes it to rows-per-task the same
    * way it tunes shuffle partition counts. */
  val HotWindowKeyRows = 100000L

  /** `RegexSplitter(new Fields(...), pattern)` analog
    * (`MultiFamilyHBaseTest.java:54-55`): split `input` on a regex into N
    * named string fields, dropping the input column (Cascading's
    * RegexSplitter replaces the argument field with its results).
    */
  def regexSplitter(input: String, pattern: String, fields: Seq[String])
                   (df: DataFrame): DataFrame = {
    val parts = split(col(input), pattern)
    val outs = fields.zipWithIndex.map { case (f, i) => parts.getItem(i).as(f) }
    val keep = df.columns.filterNot(_ == input).map(col).toSeq
    df.select(keep ++ outs: _*)
  }

  /** `ExpressionFunction(new Fields(name), javaExpr)` analog
    * (`MultiFamilyCascadeHBaseTest.java:62`): append a computed field from
    * an expression string. Cascading compiles the Java expression with
    * Janino; Spark's `expr` parses SQL and codegens with the same Janino
    * lineage — same capability, declarative plan.
    */
  def expressionFunction(field: String, sqlExpr: String)
                        (df: DataFrame): DataFrame =
    df.withColumn(field, expr(sqlExpr))

  /** `new Identity()` pass-through (`MultiFamilyHBaseTest.java:77`). */
  def identity(df: DataFrame): DataFrame = df

  /** Field retention/reordering (Cascading `Fields` projection). */
  def retain(fields: String*)(df: DataFrame): DataFrame =
    df.select(fields.map(col): _*)

  def discard(fields: String*)(df: DataFrame): DataFrame =
    df.drop(fields: _*)

  def rename(from: String, to: String)(df: DataFrame): DataFrame =
    df.withColumnRenamed(from, to)

  /** bytes -> string boundary (`Bytes.toString`, `HBaseScheme.java:94`). */
  def decodeUtf8(field: String)(df: DataFrame): DataFrame =
    df.withColumn(field, decode(col(field), "UTF-8"))

  /** string -> bytes boundary (`String.getBytes`, `HBaseScheme.java:120`).
    * The reference casts all sink values to String then bytes — we model
    * the same boundary explicitly and type-safely (a byte[] round trip
    * that would `ClassCastException` in the reference works here).
    */
  def encodeUtf8(field: String)(df: DataFrame): DataFrame =
    df.withColumn(field, encode(col(field), "UTF-8"))

  /** Compose transforms left-to-right like pipes in an assembly. */
  def pipe(stages: (DataFrame => DataFrame)*): DataFrame => DataFrame =
    stages.reduceLeft(_ andThen _)

  /** Skew-resistant two-phase sum: salt the key space, partially
    * aggregate per (key, salt), then merge per key. For a key whose row
    * count dwarfs the others, this spreads the partial work over
    * `salts` reducers instead of one hot one (AQE's skew handling
    * covers joins; aggregation skew needs the explicit salt). Works for
    * any algebraic aggregate — sum shown; the salt assignment can be
    * anything (it only partitions work).
    */
  def saltedSum(df: DataFrame, key: Column, value: Column, out: String,
                salts: Int = 16): DataFrame =
    // Salt from a ROW-LOCAL source, never from the data: a hot key whose
    // values are constant (the common skew case — default/sentinel
    // values) would map every row to one salt and defeat the spread. The
    // salt only partitions work, so any per-row value keeps the result
    // unchanged; monotonically_increasing_id is uniform within each task.
    df.select(key.as("__key"), value.as("__v"),
        pmod(monotonically_increasing_id(), lit(salts.toLong)).as("__salt"))
      .groupBy(col("__key"), col("__salt"))
      .agg(sum(col("__v")).as("__partial"))
      .groupBy(col("__key"))
      .agg(sum(col("__partial")).as(out))
      .withColumnRenamed("__key", key.toString)

  /** Skew-resistant equi join — the join dual of [[saltedSum]]. The big
    * (probe) side gets a ROW-LOCAL salt (same rationale as saltedSum:
    * never derive it from the data); the small (build) side is
    * replicated once per salt value through a generator; the join
    * matches on (key, salt), so one hot key's rows spread across
    * `salts` reducers instead of stalling the one task that owns the
    * key. The result is exactly the unsalted join: every big row meets
    * each of its small-side matches exactly once (at its own salt).
    * Use when the small side is too big to broadcast and the skew is
    * known up front; AQE's skew-join split handles the discovered-at-
    * runtime case, but salting also covers pre-shuffled/bucketed inputs
    * AQE cannot re-split. Cost: `salts`× the small side's shuffle
    * volume — cheap by construction, that side is small.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String, salts: Int = 16): DataFrame = {
    // salts <= 0 would silently produce an EMPTY join (null probe salts
    // never match), not an error — reject it here
    require(salts > 0, s"saltedJoin needs a positive salt count, got $salts")
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
        salted(bigKey) === replicated(smallKey) &&
          salted("__salt") === replicated("__salt"))
      .drop("__salt") // drops the salt from BOTH sides
  }

  /** Materialization barrier: force an expensive expression to evaluate
    * exactly ONCE per row. Catalyst's CollapseProject inlines projection
    * expressions into every downstream reference (an expression used k
    * times is computed k times — disastrous for array-valued signatures
    * referenced per-band/per-bit), but projections cannot collapse
    * across a Generate node, so routing the value through
    * `explode(array(c))` pins it. Row count and order are unchanged;
    * cost is one array allocation per row.
    */
  def materializedColumn(df: DataFrame, name: String, c: Column): DataFrame =
    df.withColumn(name, explode(array(c)))
}
