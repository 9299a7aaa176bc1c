package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{DecimalType, StructType}
import graft.kv.{KvSchema, KvTable, SinkMode}

/** Structured-Streaming queries made oracle-checkable: each runs a REAL
  * streaming query (file source, Trigger.AvailableNow, foreachBatch
  * micro-batch upserts into a KvTable), then returns the table's LWW
  * view — which must equal the equivalent BATCH query, so DuckDB can
  * check a streaming execution. Works because the KV upsert is
  * order/batching-insensitive (the ScalaCheck LWW properties) and all
  * aggregates accumulate in DECIMAL.
  */
object StreamQueries {

  private def schemaOf(s: SparkSession, dir: String, t: String): StructType =
    table(s, dir, t).schema

  /** The file stream source needs a DIRECTORY; the testdata tables are
    * single parquet files — expose each through a symlinked scratch dir. */
  private def streamDir(dir: String, t: String): String = {
    import java.nio.file.{Files, Paths}
    val d = Paths.get(scratchDir(s"streamsrc_$t", dir))
    Files.createDirectories(d)
    val link = d.resolve(s"$t.parquet")
    if (!Files.exists(link))
      Files.createSymbolicLink(link, Paths.get(s"$dir/$t.parquet"))
    d.toString
  }

  /** Run a stream to completion with AvailableNow.
    *
    * Streaming aggregations allocate one state store PER shuffle
    * partition, and every micro-batch pays per-store snapshot/commit IO
    * — at local[32] that is 32 stores for a query whose state is a few
    * thousand rows. Bound the stream's shuffle partitions to a small
    * constant (results are partition-count-insensitive: LWW upserts +
    * DECIMAL sums), restoring the session conf afterwards. On a real
    * cluster this knob is sized to state volume, not core count.
    */
  private val StreamShufflePartitions = 4

  private def runStream(df: DataFrame, outputMode: String = "update")
                       (sink: (DataFrame, Long) => Unit): Unit = {
    val spark = df.sparkSession
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, StreamShufflePartitions)
    try {
      val q = df.writeStream
        .outputMode(outputMode)
        .foreachBatch(sink)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set(key, prev)
  }

  /** Source table for [[stream_kv_source]]: orders keyed by orderkey,
    * written in two batches so the log holds multiple files. */
  private def setupKvSourceTable(s: SparkSession, dir: String): String = {
    val path = scratchDir("stream_kv_source_src", dir)
    ensureSetup(path) {
      val schema = KvSchema.of("o_orderkey",
        "o_custkey" -> ("o", "custkey"),
        "o_totalprice" -> ("o", "totalprice"))
      val o = table(s, dir, "orders")
      KvTable.write(o.filter(col("o_orderkey") % 2 === 0), path, schema,
        SinkMode.Replace)
      KvTable.write(o.filter(col("o_orderkey") % 2 === 1), path, schema,
        SinkMode.Append)
    }
    path
  }

  /** Source table for [[stream_matview]]: orders keyed by orderkey with
    * the group/sum columns, written in three appends so the log holds
    * several files (several candidate micro-batches). */
  private def setupMatViewSource(s: SparkSession, dir: String): String = {
    val path = scratchDir("stream_mv_src", dir)
    ensureSetup(path) {
      val schema = KvSchema.of("o_orderkey",
        "o_orderstatus" -> ("o", "status"),
        "o_totalprice" -> ("o", "totalprice"))
      val o = table(s, dir, "orders")
        .withColumn("o_totalprice", col("o_totalprice").cast("decimal(18,2)"))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          (unix_timestamp(col("o_orderdate")) % 3).as("third"))
      KvTable.write(o.filter(col("third") === 0), path, schema,
        SinkMode.Replace)
      KvTable.write(o.filter(col("third") === 1), path, schema,
        SinkMode.Append)
      KvTable.write(o.filter(col("third") === 2), path, schema,
        SinkMode.Append)
    }
    path
  }

  val prepares: Map[String, (SparkSession, String) => Unit] = checked(
    "stream_kv_source" -> ((s, d) => { setupKvSourceTable(s, d); () }),
    "stream_matview" -> ((s, d) => { setupMatViewSource(s, d); () })
  )

  val defs: Map[String, Q] = checked(
    // Stream-STATIC enrichment join, the canonical streaming-pipeline
    // shape Spark executes statelessly: each micro-batch of the orders
    // stream hash-joins against the static customer dimension
    // (broadcast — no shuffle of the stream side, no state store, no
    // watermark). At 100 TB/day this is THE dimension-enrichment plan;
    // only stream-stream joins need interval state (`stream_join`).
    "stream_static_join" -> { (s, dir) =>
      val path = scratchDir("stream_static_join", dir)
      KvTable.drop(s, path)
      val schema = KvSchema.of("o_orderkey",
        "o_custkey" -> ("o", "custkey"),
        "c_name" -> ("c", "name"),
        "c_mktsegment" -> ("c", "mktsegment"),
        "o_totalprice" -> ("o", "totalprice"))
      val dim = broadcast(table(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment")))
      val stream = s.readStream
        .schema(schemaOf(s, dir, "orders"))
        .parquet(streamDir(dir, "orders"))
        .filter(col("o_totalprice") > 150000.0)
        .join(dim, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
          col("c_mktsegment"), col("o_totalprice"))
      runStream(stream, outputMode = "append") { (batch, _) =>
        KvTable.write(batch, path, schema, SinkMode.Append)
      }
      KvTable.read(s, path).orderBy(col("o_orderkey"))
    },

    // Streaming COUNTERS, exactly-once: delta cells keyed by their
    // EVENT id flow through the native kvtable sink (whose
    // (queryId, epochId) commit ledger dedupes replayed micro-batches —
    // KvEpochSpec), and the counter view is one map-side-combined sum
    // over the live LWW table, grouped by user. Correct under ANY batch
    // split because addition commutes, AND under at-least-once replay
    // because redelivered events collapse on their key — the fix for
    // HBase Increment's famous non-idempotence under client retry
    // (a replayed KvCounter.increment in foreachBatch would
    // double-count; event-keyed dedup-then-sum is THE firehose counter
    // shape).
    "stream_counter" -> { (s, dir) =>
      val path = scratchDir("stream_counter", dir)
      KvTable.drop(s, path)
      val schema = KvSchema.of("event_id",
        "user_id" -> ("e", "user"),
        "delta" -> ("e", "delta"))
      val q = s.readStream
        .schema(schemaOf(s, dir, "events"))
        .parquet(streamDir(dir, "events"))
        .select(col("event_id"), col("user_id"),
          floor(col("value") * 100).cast("long").as("delta"))
        .writeStream
        .format("kvtable")
        .option("kvschema", schema.toJson)
        .option("checkpointLocation", s"$path-ckpt-${System.nanoTime()}")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start(path)
      q.awaitTermination()
      KvTable.read(s, path)
        .groupBy(col("user_id"))
        .agg(sum(col("delta")).as("value"))
        .orderBy(col("user_id"))
    },

    // Stream FROM a KV table (the connector's MicroBatchStream: new log
    // files = micro-batches — "HBase as a change feed") into a second
    // KV table; the destination's LWW view must equal plain batch SQL
    // over orders. Unique rowkeys make the re-keyed upsert exact.
    "stream_kv_source" -> { (s, dir) =>
      val src = setupKvSourceTable(s, dir)
      val dst = scratchDir("stream_kv_source", dir)
      KvTable.drop(s, dst)
      val dstSchema = KvSchema.of("o_orderkey",
        "o_custkey" -> ("o", "custkey"),
        "o_totalprice" -> ("o", "totalprice"))
      val stream = s.readStream.format("kvtable").load(src)
        .filter(!col(KvTable.TombstoneCol))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      runStream(stream, outputMode = "append") { (batch, _) =>
        KvTable.write(batch, dst, dstSchema, SinkMode.Append)
      }
      KvTable.read(s, dst).orderBy(col("o_orderkey"))
    },
    // The NATIVE streaming sink (`writeStream.format("kvtable")` —
    // StreamingWrite in the connector, one append commit per epoch)
    // instead of foreachBatch: customers flow through a file stream
    // into a fresh KV table; rowkeys are unique so the LWW view equals
    // the batch projection regardless of epoch slicing. Cross-epoch
    // LWW ordering (distinct monotone versions per epoch) is
    // spec-asserted in KvSqlDeleteSpec.
    "kv_stream_sink" -> { (s, dir) =>
      val path = scratchDir("kv_stream_sink", dir)
      KvTable.drop(s, path)
      val schema = KvSchema.of("c_custkey",
        "c_name" -> ("c", "name"),
        "c_acctbal" -> ("c", "acctbal"))
      val q = s.readStream
        .schema(schemaOf(s, dir, "customer"))
        .parquet(streamDir(dir, "customer"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .writeStream
        .format("kvtable")
        .option("kvschema", schema.toJson)
        .option("checkpointLocation", s"$path-ckpt-${System.nanoTime()}")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start(path)
      q.awaitTermination()
      KvTable.read(s, path).orderBy(col("c_custkey"))
    },

    // Streamed upsert: orders flow through a file stream into the KV
    // table; the LWW view equals the batch latest-order-per-customer.
    "kv_stream_upsert" -> { (s, dir) =>
      val path = scratchDir("kv_stream_upsert", dir)
      KvTable.drop(s, path)
      val schema = KvSchema.of("o_custkey",
        "o_orderkey" -> ("o", "orderkey"),
        "o_totalprice" -> ("o", "totalprice"))
      val version =
        unix_timestamp(col("o_orderdate")) * lit(1000000000L) + col("o_orderkey")
      val stream = s.readStream
        .schema(schemaOf(s, dir, "orders"))
        .parquet(streamDir(dir, "orders"))
      runStream(stream) { (batch, _) =>
        KvTable.write(batch, path, schema, SinkMode.Append, Some(version))
      }
      KvTable.read(s, path).orderBy(col("o_custkey"))
    },

    // Streamed windowed aggregation: per-hour event counts/sums upserted
    // into a KV table keyed by (hour, type) — equals the batch tumbling
    // window. DECIMAL accumulation keeps sums batching-insensitive.
    "kv_stream_window" -> { (s, dir) =>
      val path = scratchDir("kv_stream_window", dir)
      KvTable.drop(s, path)
      val schema = KvSchema.of("win_key",
        "hour_ts" -> ("w", "hour_ts"),
        "event_type" -> ("w", "event_type"),
        "n" -> ("w", "n"),
        "total_value" -> ("w", "total_value"))
      val stream = s.readStream
        .schema(schemaOf(s, dir, "events"))
        .parquet(streamDir(dir, "events"))
        .withColumn("t", expr("cast(ts as timestamp)"))
        .withColumn("hour_ts", date_trunc("hour", col("t")))
        .groupBy(col("hour_ts"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double")
            .as("total_value"))
        .withColumn("win_key",
          concat(col("hour_ts").cast("string"), lit("|"), col("event_type")))
      runStream(stream) { (batch, _) =>
        KvTable.write(batch, path, schema, SinkMode.Append)
      }
      KvTable.read(s, path)
        .select(col("hour_ts"), col("event_type"), col("n"), col("total_value"))
        .orderBy(col("hour_ts"), col("event_type"))
    },

    // Streaming exact dedup: documents ∪ exact copies flow through the
    // stateful `dropDuplicates` operator (state keyed by content
    // fingerprint); survivors land in the KV table. Which duplicate
    // arrives first is batching-dependent, so the checked output is the
    // (deterministic) distinct fingerprint SET — the streaming dedup a
    // training pipeline runs on a document firehose.
    "stream_dedup" -> { (s, dir) =>
      val path = scratchDir("stream_dedup", dir)
      KvTable.drop(s, path)
      val schema = KvSchema.of("fp", "one" -> ("f", "one"))
      val base = s.readStream
        .schema(schemaOf(s, dir, "documents"))
        .parquet(streamDir(dir, "documents"))
      val corpus = base.select(col("doc_id"), col("text"))
        .union(base.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val deduped = corpus
        .select(graft.text.TextOps.fingerprint(col("text")).as("fp"))
        .dropDuplicates("fp")
        .withColumn("one", lit(1L))
      runStream(deduped) { (batch, _) =>
        KvTable.write(batch, path, schema, SinkMode.Append)
      }
      KvTable.read(s, path).select(col("fp")).orderBy(col("fp"))
    },

    // Custom per-key state via mapGroupsWithState (the arbitrary-state
    // escape hatch): running (count, max) per user flows through a real
    // streaming execution; the final LWW row per key equals the batch
    // GROUP BY, so DuckDB checks the stateful operator's end state.
    // State is per-key and bounded by the key domain; at firehose scale
    // add a GroupStateTimeout to expire idle keys.
    "stream_running_stats" -> { (s, dir) =>
      import s.implicits._
      val path = scratchDir("stream_running_stats", dir)
      KvTable.drop(s, path)
      val schema = KvSchema.of("user_id",
        "n" -> ("r", "n"),
        "max_value" -> ("r", "max_value"))
      val ev = s.readStream
        .schema(schemaOf(s, dir, "events"))
        .parquet(streamDir(dir, "events"))
        .select(col("user_id"), col("value"))
        .as[(Long, Double)]
      val stats = graft.streaming.KvStream.runningStats(ev)
        .toDF("user_id", "n", "max_value")
      runStream(stats) { (batch, _) =>
        KvTable.write(batch, path, schema, SinkMode.Append)
      }
      KvTable.read(s, path).orderBy(col("user_id"))
    },

    // Streaming SESSION windows (dynamic-gap windowing the tumbling
    // kv_stream_window can't express): per-user sessions close after 30
    // idle minutes. Complete output mode + per-batch Replace makes the
    // result batching-insensitive even when later events merge earlier
    // sessions (no watermark = no dropped late data; at firehose scale
    // you'd watermark + append and bound state instead — documented
    // trade). The oracle rebuilds Spark's exact session semantics: a
    // gap >= 30min starts a new session ([start, last+gap) windows),
    // sess_end = last event + gap.
    "stream_sessionize" -> { (s, dir) =>
      val path = scratchDir("stream_sessionize", dir)
      KvTable.drop(s, path)
      val schema = KvSchema.of("sk",
        "user_id" -> ("w", "user_id"),
        "sess_start" -> ("w", "sess_start"),
        "sess_end" -> ("w", "sess_end"),
        "n_events" -> ("w", "n_events"))
      val stream = s.readStream
        .schema(schemaOf(s, dir, "events"))
        .parquet(streamDir(dir, "events"))
        .filter(col("user_id") < 200)
        .withColumn("t", expr("cast(ts as timestamp)"))
        .groupBy(col("user_id"), session_window(col("t"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("sw.start").as("sess_start"),
          col("sw.end").as("sess_end"), col("n_events"))
        .withColumn("sk", concat_ws("|",
          col("user_id"), unix_micros(col("sess_start"))))
      runStream(stream, outputMode = "complete") { (batch, _) =>
        KvTable.write(batch, path, schema, SinkMode.Replace)
      }
      KvTable.read(s, path)
        .select(col("user_id"), col("sess_start"), col("sess_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("sess_start"))
    },

    // CONTINUOUSLY-maintained summary view: the KV log streams through
    // foreachBatch; every micro-batch upserts the base table AND
    // delta-refreshes the materialized per-status aggregate (built on
    // the first batch) — the serving-layer pattern where a dashboard
    // table stays fresh under a firehose without ever rescanning the
    // base. Deterministic under ANY micro-batch split because refresh
    // convergence is batching-insensitive (KvMatViewProps fuzzes
    // exactly that); the oracle recomputes the aggregate from scratch.
    "stream_matview" -> { (s, dir) =>
      import graft.kv.KvMatView
      val src = setupMatViewSource(s, dir)
      val base = scratchDir("stream_mv_base", dir)
      val view = scratchDir("stream_mv_view", dir)
      KvTable.drop(s, base)
      KvTable.drop(s, view)
      val schema = KvSchema.of("o_orderkey",
        "o_orderstatus" -> ("o", "status"),
        "o_totalprice" -> ("o", "totalprice"))
      val stream = s.readStream.format("kvtable").load(src)
        .filter(!col(KvTable.TombstoneCol))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      runStream(stream, outputMode = "append") { (batch, _) =>
        KvTable.write(batch, base, schema, SinkMode.Append)
        if (!KvTable.exists(s, view))
          KvMatView.build(s, base, view, "o_orderstatus",
            Seq("o_totalprice"))
        else KvMatView.refresh(s, base, view)
      }
      KvMatView.refresh(s, base, view) // cover a post-stream tail batch
      KvMatView.read(s, view)
        .select(col("o_orderstatus"), col("cnt"),
          col("sum_o_totalprice").cast("double").as("sum_o_totalprice"))
        .orderBy(col("o_orderstatus"))
    },

    // flatMapGroupsWithState with EVENT-TIME TIMEOUT: the session
    // TRACKER shape (vs stream_sessionize's session_window AGGREGATE) —
    // a session closes and emits either the moment a later event proves
    // the 30-min gap elapsed, or when the watermark passes last+gap and
    // the key's timeout fires (state freed per key, the boundedness
    // mechanism a firehose needs). Deterministic because the final
    // watermark is max(event time) - 1h: every session is provably
    // closed-or-open at end of stream, and the oracle reproduces the
    // exact fire condition (ceil-ms timeout < floor-ms watermark).
    "stream_session_timeout" -> { (s, dir) =>
      import s.implicits._
      val path = scratchDir("stream_session_timeout", dir)
      KvTable.drop(s, path)
      val schema = KvSchema.of("sk",
        "user_id" -> ("w", "user_id"),
        "sess_start" -> ("w", "sess_start"),
        "sess_end" -> ("w", "sess_end"),
        "n_events" -> ("w", "n_events"))
      val ev = s.readStream
        .schema(schemaOf(s, dir, "events"))
        .parquet(streamDir(dir, "events"))
        .filter(col("user_id") < 200)
        .withColumn("t", expr("cast(ts as timestamp)"))
        .withWatermark("t", "1 hour")
        .select(col("user_id"), col("t"))
        .as[(Long, java.sql.Timestamp)]
      val sessions = graft.streaming.KvStream
        .expiringSessions(ev, gapUs = 1800L * 1000000L).toDF()
        .withColumn("sk", concat_ws("|",
          col("user_id"), unix_micros(col("sess_start"))))
      runStream(sessions, outputMode = "append") { (batch, _) =>
        KvTable.write(batch, path, schema, SinkMode.Append)
      }
      KvTable.read(s, path)
        .select(col("user_id"), col("sess_start"), col("sess_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("sess_start"))
    },

    // Stream-STREAM interval join: user events joined to that customer's
    // orders within ±3 days, both sides watermarked (inner joins emit
    // eagerly; the watermark bounds join state — without it, state grows
    // forever on a real firehose). Distinct triples equal the batch
    // interval join, so DuckDB checks a genuine two-stream execution.
    "stream_join" -> { (s, dir) =>
      val path = scratchDir("stream_join", dir)
      KvTable.drop(s, path)
      val schema = KvSchema.of("jk",
        "user_id" -> ("j", "user_id"),
        "t" -> ("j", "t"),
        "o_orderkey" -> ("j", "orderkey"))
      val ev = s.readStream
        .schema(schemaOf(s, dir, "events"))
        .parquet(streamDir(dir, "events"))
        .filter(col("user_id") < 50)
        .withColumn("t", expr("cast(ts as timestamp)"))
        .withWatermark("t", "1 day")
        .select(col("user_id"), col("t"))
      val ord = s.readStream
        .schema(schemaOf(s, dir, "orders"))
        .parquet(streamDir(dir, "orders"))
        .filter(col("o_custkey") < 50)
        // watermarks require TIMESTAMP (ltz); orders store NTZ. Session
        // tz is UTC, so the cast is value-preserving. Orders live in
        // 1995-2001 and events in Jan-2024: shift orders +29 years so
        // the interval join has a real overlap (mirrored in the oracle).
        .withColumn("o_orderdate",
          col("o_orderdate").cast("timestamp") + expr("INTERVAL 29 YEARS"))
        .withWatermark("o_orderdate", "1 day")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      val joined = ev.join(ord,
        col("user_id") === col("o_custkey") &&
          col("t") >= col("o_orderdate") - expr("INTERVAL 3 DAYS") &&
          col("t") <= col("o_orderdate") + expr("INTERVAL 3 DAYS"))
        .withColumn("jk", concat_ws("|",
          col("user_id"), unix_micros(col("t")), col("o_orderkey")))
        .select(col("jk"), col("user_id"), col("t"), col("o_orderkey"))
      runStream(joined, outputMode = "append") { (batch, _) =>
        KvTable.write(batch, path, schema, SinkMode.Append)
      }
      KvTable.read(s, path)
        .select(col("user_id"), col("t"), col("o_orderkey"))
        .orderBy(col("user_id"), col("t"), col("o_orderkey"))
    },

    // Stream-stream LEFT OUTER interval join: matched rows emit eagerly
    // like the inner join; UNMATCHED left rows emit null-padded only
    // when the watermark proves no future right row can match (state
    // eviction at wm > t + interval) — the semantics watermarks exist
    // for. Determinism bound: the left side is clipped to t <
    // 2024-01-25, ≥ 2 days clear of final-watermark eviction (events
    // end Jan 30, wm delay 1d + interval 3d), so every clipped row's
    // fate — match or null — resolves inside the run and the batch
    // left join reproduces it exactly.
    "stream_join_left" -> { (s, dir) =>
      val path = scratchDir("stream_join_left", dir)
      KvTable.drop(s, path)
      val schema = KvSchema.of("jk",
        "user_id" -> ("j", "user_id"),
        "t" -> ("j", "t"),
        "o_orderkey" -> ("j", "orderkey"))
      val ev = s.readStream
        .schema(schemaOf(s, dir, "events"))
        .parquet(streamDir(dir, "events"))
        .filter(col("user_id") < 20)
        .withColumn("t", expr("cast(ts as timestamp)"))
        // clip AFTER the watermark node: the watermark must observe the
        // full event range (max Jan 30) so eviction passes the clip
        // bound; clipping first would cap the watermark at clip - 1d
        // and strand the last days' unmatched rows in state forever
        .withWatermark("t", "1 day")
        .filter(col("t") < lit("2024-01-25").cast("timestamp"))
        .select(col("user_id"), col("t"))
      val ord = s.readStream
        .schema(schemaOf(s, dir, "orders"))
        .parquet(streamDir(dir, "orders"))
        .filter(col("o_custkey") < 20)
        .withColumn("o_orderdate",
          col("o_orderdate").cast("timestamp") + expr("INTERVAL 29 YEARS"))
        .withWatermark("o_orderdate", "1 day")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      val joined = ev.join(ord,
        col("user_id") === col("o_custkey") &&
          col("t") >= col("o_orderdate") - expr("INTERVAL 3 DAYS") &&
          col("t") <= col("o_orderdate") + expr("INTERVAL 3 DAYS"),
        "left_outer")
        .withColumn("jk", concat_ws("|",
          col("user_id"), unix_micros(col("t")),
          coalesce(col("o_orderkey"), lit(-1L))))
        // unmatched rows carry -1, not NULL: nullable-int columns
        // round-trip differently across engines' parquet/pandas
        // renderings, and -1 is unambiguous here (real keys are > 0)
        .select(col("jk"), col("user_id"), col("t"),
          coalesce(col("o_orderkey"), lit(-1L)).as("o_orderkey"))
      runStream(joined, outputMode = "append") { (batch, _) =>
        KvTable.write(batch, path, schema, SinkMode.Append)
      }
      KvTable.read(s, path)
        .select(col("user_id"), col("t"), col("o_orderkey"))
        .orderBy(col("user_id"), col("t"), col("o_orderkey"))
    },

    // SALTED stream-STREAM interval join — the production answer to a
    // hot key in a streaming join, demonstrated rather than asserted
    // (SCALING_r06.md §1 excludes the unsalted stream joins from the
    // skew gate because a doubly-hot key makes the ANSWER quadratic;
    // salting cannot shrink that output, but it spreads a hot key's
    // matching WORK and join STATE across SALTS partitions instead of
    // one). The equality key becomes (user_id, salt): the events side
    // derives its salt from the row (hash of (user_id, t)), the orders
    // side replicates each row to ALL salts — orders state grows
    // SALTS×, the per-partition share of a hot key's work drops
    // SALTS× — and every event row still meets each matching order
    // exactly once (at its own salt), so the join result is identical
    // to stream_join's shape and the oracle is the same plain SQL
    // interval join with no salt in sight.
    "stream_join_salted" -> { (s, dir) =>
      val path = scratchDir("stream_join_salted", dir)
      KvTable.drop(s, path)
      val schema = KvSchema.of("jk",
        "user_id" -> ("j", "user_id"),
        "t" -> ("j", "t"),
        "o_orderkey" -> ("j", "orderkey"))
      val salts = 8
      val ev = s.readStream
        .schema(schemaOf(s, dir, "events"))
        .parquet(streamDir(dir, "events"))
        .filter(col("user_id") < 50)
        .withColumn("t", expr("cast(ts as timestamp)"))
        .withWatermark("t", "1 day")
        .withColumn("salt",
          pmod(xxhash64(col("user_id"), col("t")), lit(salts.toLong)))
        .select(col("user_id"), col("t"), col("salt"))
      val ord = s.readStream
        .schema(schemaOf(s, dir, "orders"))
        .parquet(streamDir(dir, "orders"))
        .filter(col("o_custkey") < 50)
        .withColumn("o_orderdate",
          col("o_orderdate").cast("timestamp") + expr("INTERVAL 29 YEARS"))
        .withWatermark("o_orderdate", "1 day")
        .withColumn("o_salt",
          explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_salt"))
      val joined = ev.join(ord,
        col("user_id") === col("o_custkey") &&
          col("salt") === col("o_salt") &&
          col("t") >= col("o_orderdate") - expr("INTERVAL 3 DAYS") &&
          col("t") <= col("o_orderdate") + expr("INTERVAL 3 DAYS"))
        .withColumn("jk", concat_ws("|",
          col("user_id"), unix_micros(col("t")), col("o_orderkey")))
        .select(col("jk"), col("user_id"), col("t"), col("o_orderkey"))
      runStream(joined, outputMode = "append") { (batch, _) =>
        KvTable.write(batch, path, schema, SinkMode.Append)
      }
      KvTable.read(s, path)
        .select(col("user_id"), col("t"), col("o_orderkey"))
        .orderBy(col("user_id"), col("t"), col("o_orderkey"))
    }
  )

  val oracles: Map[String, String] = checked(
    "stream_counter" ->
      """SELECT user_id,
        |  CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "stream_static_join" ->
      """SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 150000.0
        |ORDER BY o_orderkey""".stripMargin,
    "stream_kv_source" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "kv_stream_sink" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "kv_stream_upsert" ->
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,
    "kv_stream_window" ->
      """SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour_ts,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY hour_ts, event_type""".stripMargin,
    "stream_dedup" ->
      """SELECT DISTINCT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |FROM (SELECT doc_id, text FROM documents
        |      UNION ALL
        |      SELECT doc_id + 1000000 AS doc_id, text
        |      FROM documents WHERE doc_id % 7 = 0)
        |ORDER BY fp""".stripMargin,
    "stream_running_stats" ->
      """SELECT user_id, COUNT(*) AS n, MAX(value) AS max_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "stream_matview" ->
      """SELECT o_orderstatus, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_o_totalprice
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "stream_session_timeout" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t
        |            FROM events WHERE user_id < 200),
        |mx AS (SELECT max(epoch_us(t)) AS max_us FROM ev),
        |sids AS (
        |  SELECT user_id, t,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM (
        |    SELECT user_id, t,
        |      CASE WHEN prev_t IS NULL
        |             OR epoch_us(t) - epoch_us(prev_t) >= 1800000000
        |           THEN 1 ELSE 0 END AS new_sess
        |    FROM (
        |      SELECT user_id, t,
        |        lag(t) OVER (PARTITION BY user_id ORDER BY t) AS prev_t
        |      FROM ev))),
        |sess AS (
        |  SELECT user_id, sid, MIN(t) AS sess_start,
        |    MAX(t) + INTERVAL 30 MINUTE AS sess_end,
        |    MAX(epoch_us(t)) AS last_us, COUNT(*) AS n_events
        |  FROM sids GROUP BY user_id, sid)
        |SELECT user_id, sess_start, sess_end, n_events
        |FROM sess, mx
        |WHERE sid < (SELECT max(s2.sid) FROM sess s2
        |             WHERE s2.user_id = sess.user_id)
        |   OR (last_us + 1800000000 + 999) // 1000 < max_us // 1000 - 3600000
        |ORDER BY user_id, sess_start""".stripMargin,
    "stream_sessionize" ->
      """SELECT user_id, MIN(t) AS sess_start,
        |  MAX(t) + INTERVAL 30 MINUTE AS sess_end,
        |  COUNT(*) AS n_events
        |FROM (
        |  SELECT user_id, t,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM (
        |    SELECT user_id, t,
        |      CASE WHEN prev_t IS NULL
        |             OR epoch_us(t) - epoch_us(prev_t) >= 1800000000
        |           THEN 1 ELSE 0 END AS new_sess
        |    FROM (
        |      SELECT user_id, CAST(ts AS TIMESTAMP) AS t,
        |        lag(CAST(ts AS TIMESTAMP)) OVER (
        |          PARTITION BY user_id ORDER BY ts) AS prev_t
        |      FROM events WHERE user_id < 200)))
        |GROUP BY user_id, sid
        |ORDER BY user_id, sess_start""".stripMargin,
    "stream_join" ->
      """SELECT DISTINCT e.user_id, CAST(e.ts AS TIMESTAMP) AS t, o.o_orderkey
        |FROM events e JOIN orders o
        |  ON e.user_id = o.o_custkey
        | AND CAST(e.ts AS TIMESTAMP)
        |       >= o.o_orderdate + INTERVAL 29 YEAR - INTERVAL 3 DAY
        | AND CAST(e.ts AS TIMESTAMP)
        |       <= o.o_orderdate + INTERVAL 29 YEAR + INTERVAL 3 DAY
        |WHERE e.user_id < 50
        |ORDER BY user_id, t, o_orderkey""".stripMargin,
    // identical to stream_join's oracle: the salt is an execution
    // detail that must cancel out of the answer entirely
    "stream_join_salted" ->
      """SELECT DISTINCT e.user_id, CAST(e.ts AS TIMESTAMP) AS t, o.o_orderkey
        |FROM events e JOIN orders o
        |  ON e.user_id = o.o_custkey
        | AND CAST(e.ts AS TIMESTAMP)
        |       >= o.o_orderdate + INTERVAL 29 YEAR - INTERVAL 3 DAY
        | AND CAST(e.ts AS TIMESTAMP)
        |       <= o.o_orderdate + INTERVAL 29 YEAR + INTERVAL 3 DAY
        |WHERE e.user_id < 50
        |ORDER BY user_id, t, o_orderkey""".stripMargin,
    "stream_join_left" ->
      """SELECT DISTINCT e.user_id, CAST(e.ts AS TIMESTAMP) AS t,
        |  COALESCE(o.o_orderkey, -1) AS o_orderkey
        |FROM (SELECT * FROM events WHERE user_id < 20
        |      AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-25') e
        |LEFT JOIN (SELECT * FROM orders WHERE o_custkey < 20) o
        |  ON e.user_id = o.o_custkey
        | AND CAST(e.ts AS TIMESTAMP)
        |       >= o.o_orderdate + INTERVAL 29 YEAR - INTERVAL 3 DAY
        | AND CAST(e.ts AS TIMESTAMP)
        |       <= o.o_orderdate + INTERVAL 29 YEAR + INTERVAL 3 DAY
        |ORDER BY user_id, t, o_orderkey""".stripMargin
  )
}
