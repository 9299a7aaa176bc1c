package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}
import graft.kv.{KvSchema, KvTable, SinkMode}

/** Structured-Streaming surface (SURVEY.md §2i). The reference is
  * batch-only; its incremental analog is flow-at-a-time APPEND — each
  * APPEND-mode flow run is a micro-batch upsert into the table
  * (`MultiFamilyCascadeHBaseTest.java:94-104`). These helpers are the
  * streaming generalization: a micro-batch IS a flow run.
  */
object KvStream {

  /** Continuous upsert sink: every micro-batch APPEND-writes into the
    * KvTable log; readers see last-write-wins per key, exactly like a
    * stream of HBase Puts. Restart-safe because the write path is
    * append-only and versions are monotone per batch.
    */
  def kvUpsertWriter(stream: DataFrame, path: String, schema: KvSchema,
                     versionFrom: Option[Column] = None): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        KvTable.write(batch, path, schema, SinkMode.Append, versionFrom)
      }

  /** Watermarked tumbling-window counts/sums over an event-time column —
    * late data beyond the watermark is dropped, state is bounded. */
  def windowedAgg(events: DataFrame, tsCol: String, windowLen: String,
                  watermark: String, key: Column): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), key)
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

  /** Per-key running state via mapGroupsWithState: the custom-state
    * escape hatch (running count + max seen). State is per key and
    * bounded by the key domain; use timeouts for session semantics.
    */
  case class RunningState(n: Long, maxValue: Double)

  def runningStats[K: Encoder](events: Dataset[(K, Double)])(
      implicit out: Encoder[(K, Long, Double)]): Dataset[(K, Long, Double)] = {
    implicit val stateEnc: Encoder[RunningState] =
      org.apache.spark.sql.Encoders.product[RunningState]
    events.groupByKey(_._1)
      .mapGroupsWithState[RunningState, (K, Long, Double)](
        GroupStateTimeout.NoTimeout()) {
        (key: K, rows: Iterator[(K, Double)], state: GroupState[RunningState]) =>
          val prev = state.getOption.getOrElse(RunningState(0L, Double.MinValue))
          val vals = rows.map(_._2).toSeq
          val next = RunningState(prev.n + vals.size,
            math.max(prev.maxValue, if (vals.isEmpty) Double.MinValue else vals.max))
          state.update(next)
          (key, next.n, next.maxValue)
      }
  }
}
