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

  /** One closed session per (user, start): emitted either when a LATER
    * event proves the gap elapsed, or by EVENT-TIME TIMEOUT when the
    * watermark passes `last + gap` — the session-tracker shape
    * `session_window` can't express (it emits aggregates on watermark
    * only; this operator also closes sessions mid-stream the moment the
    * data shows the gap, keeps exactly one open session per key in
    * state, and frees the key's state the instant it times out). */
  case class SessState(startUs: Long, lastUs: Long, n: Long)
  case class SessionOut(user_id: Long, sess_start: java.sql.Timestamp,
                        sess_end: java.sql.Timestamp, n_events: Long)

  private def tsMicros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000) % 1000L

  private def microTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** `events` = (user_id, event time), already `withWatermark`-ed on the
    * time column (EventTimeTimeout requires it). Within a batch events
    * are sorted before the gap split; across batches arrival order is
    * assumed watermark-monotone (the operator's standard contract —
    * later-batch events older than the open session's last event merge
    * into it rather than reopening history). */
  def expiringSessions(events: Dataset[(Long, java.sql.Timestamp)],
                       gapUs: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, microTs(s.startUs),
              microTs(s.lastUs + gapUs), s.n))
          } else {
            val sorted = rows.map(r => tsMicros(r._2)).toArray.sorted
            var out = List.empty[SessionOut]
            var (start, last, n) = state.getOption
              .map(s => (s.startUs, s.lastUs, s.n)).getOrElse((0L, 0L, 0L))
            sorted.foreach { u =>
              if (n == 0L) { start = u; last = u; n = 1L }
              else if (u - last >= gapUs) {
                // the data itself proves the gap: close immediately
                out ::= SessionOut(user, microTs(start),
                  microTs(last + gapUs), n)
                start = u; last = u; n = 1L
              } else {
                // best-effort cross-batch merge: an admitted event may
                // predate the open session's recorded bounds (arrival
                // order is only watermark-monotone) — widen both ends
                start = math.min(start, u)
                last = math.max(last, u)
                n += 1L
              }
            }
            if (n > 0L) {
              state.update(SessState(start, last, n))
              // timeout in WATERMARK (ms) domain: ceil so it never
              // fires before the true micro-second session end
              state.setTimeoutTimestamp((last + gapUs + 999L) / 1000L)
            }
            out.reverseIterator
          }
      }
  }
}
