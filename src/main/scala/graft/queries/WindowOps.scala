package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.streaming.Streams
import H._

/** Event-time window operators over `events` (SURVEY.md §2.10 EXT):
  * tumbling, sliding, and session windows, batch-mode first — the same
  * `window`/`session_window` expressions run unchanged under Structured
  * Streaming (see graft.streaming for the streaming wiring + watermarks).
  *
  * Scale notes: a tumbling/sliding window agg is one hash shuffle on
  * (window, keys) — identical cost shape to a date groupBy; session
  * windows shuffle on the user key and sort within partitions, which is
  * the unavoidable minimum for gap-based sessionization.
  *
  * Determinism notes: DuckDB reads events.ts at nanosecond precision,
  * Spark's loader floor-truncates to microseconds (Tables.events). Hour
  * buckets are immune; the session-gap comparison works on
  * second-truncated timestamps so both engines compare identical values.
  * Money sums go through integer cents (H.moneySum).
  */
object WindowOps {


  /** Streaming-gate scaffolding shared by q48/q57/q58: materialize the
    * source table into a temp dir (streaming scans need a directory +
    * explicit schema), run the caller's streaming query to completion on
    * a conf-scoped clone (4 shuffle partitions: stateful stages pay
    * per-partition state-store overhead per micro-batch), then read the
    * sink back on the caller's session and delete the source/checkpoint
    * trees — the sink dir must outlive the returned lazy frame. */
  /** `key` identifies the gate (no sharing even when two gates project
    * the same columns): the source parquet is DETERMINISTIC per
    * (gate, corpus), so it Scratch-materializes once and each
    * invocation file-copies it (~ms) instead of re-running the
    * read+shuffle+write job inside the timed region — the copy is
    * still private because the drives APPEND sentinel files to it.
    * The streaming operator's cost (batches, state commits, sink) is
    * untouched; only the input-staging job leaves the measurement,
    * the same line every Scratch fixture draws. */
  private def streamGate(s: org.apache.spark.sql.SparkSession,
                         source: org.apache.spark.sql.DataFrame,
                         key: String, dir: String)(
      drive: (org.apache.spark.sql.SparkSession, String, String, String) => Unit)
      : org.apache.spark.sql.DataFrame = {
    // the cache key carries everything the staged bytes depend on
    // (r17 review): the session TIMEZONE (most sources cast the NTZ
    // event time through the session zone — two sessions with
    // different zones must not share one staging) and the source's
    // CANONICALIZED plan (a call site editing its projection
    // auto-invalidates; exprIds are normalized, so the string is
    // stable across JVMs for the same plan)
    val tz = s.conf.get("spark.sql.session.timeZone", "")
    val plan = source.queryExecution.analyzed.canonicalized.toString
    val pristine = graft.core.Scratch.materialize(s"stream_src_$key",
      s"v1|$dir|$tz|$plan|${graft.core.Scratch.sourceSignature(dir)}") { p =>
      source.coalesce(4).write.mode("overwrite")
        .parquet(java.nio.file.Paths.get(p, "src").toString)
    }
    val tmp = Files.createTempDirectory("stream_gate")
    val srcDir = tmp.resolve("src").toString
    val outDir = tmp.resolve("out").toString
    val ckptDir = tmp.resolve("ckpt").toString
    graft.core.Fs.copyRecursively(
      java.nio.file.Paths.get(pristine, "src"),
      java.nio.file.Paths.get(srcDir))
    // 4 shuffle partitions, not the session's 32 (or the earlier 8):
    // per-partition state-store commit cost dominates these bounded
    // drains — the r12 sweep measured drain1+drain2 on the q173 join
    // at ~3.4 s with 4 partitions, ~5 s with 8, ~11 s with 32. On a
    // real cluster with unbounded sources this knob is throughput-
    // sized instead; results are partition-count-invariant either way.
    val sc = graft.core.Sessions.scoped(s, "spark.sql.shuffle.partitions" -> "4")
    try drive(sc, srcDir, outDir, ckptDir)
    finally Seq(srcDir, ckptDir).foreach(graft.core.Fs.deleteRecursively)
    s.read.parquet(outDir)
  }

  val all: Seq[Q] = Seq(

    // -------------------------------------------------- tumbling window
    Q("q35_window_tumbling",
      "Tumbling 1-hour event-time windows: per-window totals, conditional " +
        "counts, exact revenue.",
      Some(s"""
        SELECT time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS ws,
               COUNT(*) AS n,
               ${oCnt("event_type='purchase'")} AS n_purchase,
               ${oMoneySum("value")} AS receita
        FROM events GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(
          count(lit(1)).as("n"),
          cnt(col("event_type") === "purchase").as("n_purchase"),
          moneySum(col("value")).as("receita"))
        .select(col("window.start").as("ws"), col("n"), col("n_purchase"),
          col("receita"))
        .orderBy("ws")
    },

    // --------------------------------------------------- sliding window
    Q("q36_window_sliding",
      "Sliding windows (2-hour length, 1-hour slide): every event lands in " +
        "two windows; per-window counts and exact revenue.",
      Some(s"""
        WITH b AS (SELECT time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS tb,
                          event_type, value
                   FROM events),
        x AS (SELECT tb AS ws, event_type, value FROM b
              UNION ALL
              SELECT tb - INTERVAL '1 hour' AS ws, event_type, value FROM b)
        SELECT ws, COUNT(*) AS n,
               ${oCnt("event_type='error'")} AS n_error,
               ${oMoneySum("value")} AS receita
        FROM x GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "2 hours", "1 hour"))
        .agg(
          count(lit(1)).as("n"),
          cnt(col("event_type") === "error").as("n_error"),
          moneySum(col("value")).as("receita"))
        .select(col("window.start").as("ws"), col("n"), col("n_error"),
          col("receita"))
        .orderBy("ws")
    },

    // ---------------------------------- chained multi-stateful streaming
    Q("q184_stream_chained_agg",
      "CHAINED stateful streaming operators (Spark's multiple-stateful-" +
        "operator support): a watermarked hourly tumbling aggregation " +
        "feeds a SECOND windowed aggregation — daily rollups of " +
        "event counts and distinct active hours — inside one streaming " +
        "query, the time_window-over-window_time chaining the engine " +
        "resolves event time through. Append semantics compose: an " +
        "hourly window only reaches stage 2 once the watermark closes " +
        "it, and a daily window only emits once the watermark passes " +
        "its end — yet q48's two-sentinel ladder still suffices: the batch " +
        "that applies sentinel 1's watermark evicts the tail hourly " +
        "windows into stage 2 AND closes the dailies in the same batch " +
        "(in-batch state is evaluated against the incoming watermark, " +
        "already far ahead). Hash-compared to the batch double-grouping " +
        "oracle: the unified-model proof for stateful CHAINS, where " +
        "q48 proved the single-stage case. At 100 TB each stage is " +
        "one (window)-keyed state store partitioned by the same " +
        "shuffle as its batch twin; nothing is driver-sided.",
      Some("""
        WITH h AS (SELECT time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS hs,
                          COUNT(*) AS n
                   FROM events GROUP BY 1)
        SELECT time_bucket(INTERVAL '1 day', hs) AS ds,
               CAST(SUM(n) AS BIGINT) AS n_events, COUNT(*) AS n_hours
        FROM h GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("ts").cast("timestamp").as("ts_ltz"))
      val maxTs = ev.agg(max(col("ts_ltz"))).head().getTimestamp(0).toInstant
      streamGate(s, ev, "q184", dir) { (sc, srcDir, outDir, ckptDir) =>
        def sentinel(hoursAhead: Int): Unit =
          sc.range(1)
            .select(lit(java.sql.Timestamp.from(maxTs.plusSeconds(hoursAhead * 3600L)))
              .as("ts_ltz"))
            .write.mode("append").parquet(srcDir)
        val stream = Streams.eventsStream(sc, srcDir, ev.schema)
        val hourly = stream.withWatermark("ts_ltz", "1 hour")
          .groupBy(window(col("ts_ltz"), "1 hour"))
          .agg(count(lit(1)).as("n"))
        val daily = hourly
          .groupBy(window(window_time(col("window")), "1 day"))
          .agg(sum(col("n")).as("n_events"), count(lit(1)).as("n_hours"))
          .select(col("window.start").as("ds"),
            col("n_events"), col("n_hours"))
        val q = Streams.parquetSink(daily, outDir, ckptDir).start()
        try {
          q.processAllAvailable() // all real data into stage-1 state
          sentinel(1000)
          // ONE sentinel suffices (r16 item 6, probed 5x deterministic):
          // processAllAvailable returns only after MicroBatchExecution
          // stops constructing batches, and a stateful plan's
          // shouldRunAnotherBatch keeps constructing NO-DATA batches
          // while the advanced watermark can still evict — so the
          // engine itself runs the batch that applies sentinel's
          // watermark (evicting hourly -> stage 2 and closing every
          // real daily window) before this call returns
          q.processAllAvailable()
        } finally q.stop()
      }
        .filter(col("ds") < lit(java.sql.Timestamp.from(
          maxTs.plusSeconds(500 * 3600L))))
        .select(col("ds").cast("timestamp_ntz").as("ds"),
          col("n_events"), col("n_hours"))
        .orderBy("ds")
    },

    // -------------------------------------------- stream-static join
    Q("q188_stream_static_join",
      "Stream-STATIC join — the enrichment shape every streaming " +
        "pipeline runs (q73/q173 cover stream-stream): the event " +
        "stream joins a static dimension table (customers) inside the " +
        "streaming query, STATELESS — no watermark, no state store, " +
        "rows flush with their micro-batch — and the static side " +
        "plans as a broadcast under the stream's incremental plan, " +
        "re-resolved per micro-batch (how dimension updates become " +
        "visible mid-stream on a real feed). One drain, no sentinel " +
        "ladder; the enriched sink aggregates per market segment and " +
        "must equal the batch join exactly. At 100 TB the dimension " +
        "broadcast is the whole point: zero shuffle of the stream " +
        "side, per-batch cost linear in batch size.",
      Some(s"""
        SELECT c.c_mktsegment AS segment, COUNT(*) AS n_events,
               ${oCnt("e.event_type = 'purchase'")} AS n_purchase,
               ${oMoneySum("e.value")} AS receita
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("value"))
      streamGate(s, ev, "q188", dir) { (sc, srcDir, outDir, ckptDir) =>
        val stream = Streams.eventsStream(sc, srcDir, ev.schema)
          .join(broadcast(Tables.customer(sc, dir)
            .select(col("c_custkey"), col("c_mktsegment"))),
            col("user_id") === col("c_custkey"))
          .select(col("c_mktsegment"), col("event_type"), col("value"))
        val q = Streams.parquetSink(stream, outDir, ckptDir).start()
        try q.processAllAvailable() finally q.stop()
      }
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_events"),
          cnt(col("event_type") === "purchase").as("n_purchase"),
          moneySum(col("value")).as("receita"))
        .orderBy("segment")
    },

    // --------------------------------------------------- session window
    Q("q37_window_session",
      "Gap-based sessionization: per-user sessions with a 4-hour " +
        "inactivity gap via session_window. Boundary semantics " +
        "(empirically pinned by an exact-gap pair in the sf0.1 data): " +
        "Spark MERGES an event arriving exactly `gap` after the previous " +
        "one — the session end is inclusive — so the oracle's island " +
        "computation breaks only on diff > gap.",
      Some(s"""
        WITH e AS (SELECT user_id, date_trunc('second', ts::TIMESTAMP) AS tss, value
                   FROM events),
        g AS (SELECT user_id, tss, value,
                     CASE WHEN lag(tss) OVER w IS NULL
                            OR tss - lag(tss) OVER w > INTERVAL '4 hours'
                          THEN 1 ELSE 0 END AS brk
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tss)),
        s AS (SELECT user_id, tss, value,
                     SUM(brk) OVER (PARTITION BY user_id ORDER BY tss
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM g)
        SELECT user_id, MIN(tss) AS session_start, COUNT(*) AS n_events,
               ${oMoneySum("value")} AS receita
        FROM s GROUP BY user_id, sid ORDER BY 1, 2""")) { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("tss", date_trunc("second", col("ts")))
        .groupBy(col("user_id"), session_window(col("tss"), "4 hours"))
        .agg(
          count(lit(1)).as("n_events"),
          moneySum(col("value")).as("receita"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("n_events"), col("receita"))
        .orderBy("user_id", "session_start")
    },

    // ---------------------------------------- batch-vs-stream equivalence
    Q("q48_stream_tumbling",
      "The unified-model claim under the gate: the SAME tumbling-window " +
        "aggregation as q35, executed through Structured Streaming " +
        "(file source -> watermark -> append-mode parquet sink) and " +
        "hash-compared to the batch oracle. Append mode only emits a " +
        "window once the watermark passes its end, so two far-future " +
        "sentinel files drive the watermark past every real window " +
        "(watermark advances at batch boundaries: sentinel 1 flushes the " +
        "real windows, sentinel 2 flushes nothing but forces the batch " +
        "that applies sentinel 1's watermark); the sentinel windows are " +
        "filtered back out. Runs at UTC (the driver's session timezone) — " +
        "the NTZ->LTZ round trip is the identity there.",
      Some("""
        SELECT time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS ws,
               COUNT(*) AS n
        FROM events GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      // watermarks reject TIMESTAMP_NTZ, so ts goes through LTZ for the
      // stream and back to NTZ at the end
      val ev = Tables.events(s, dir)
        .select(col("ts").cast("timestamp").as("ts_ltz"))
      val maxTs = ev.agg(max(col("ts_ltz"))).head().getTimestamp(0).toInstant
      streamGate(s, ev, "q48", dir) { (sc, srcDir, outDir, ckptDir) =>
        def sentinel(hoursAhead: Int): Unit =
          sc.range(1)
            .select(lit(java.sql.Timestamp.from(maxTs.plusSeconds(hoursAhead * 3600L)))
              .as("ts_ltz"))
            .write.mode("append").parquet(srcDir)
        val stream = Streams.eventsStream(sc, srcDir, ev.schema)
        val agg = Streams.tumblingCounts(stream, "ts_ltz", "1 hour", "1 hour")
        val q = Streams.parquetSink(agg, outDir, ckptDir).start()
        try {
          q.processAllAvailable() // batch 1: all real data
          sentinel(1000)
          // batch 2 ingests the sentinel; the engine then self-runs the
          // NO-DATA batch that applies its watermark and flushes every
          // real window before processAllAvailable returns (see q184 —
          // shouldRunAnotherBatch keeps the cascade going; one sentinel,
          // not two: r16 item 6)
          q.processAllAvailable()
        } finally q.stop()
      }
        .filter(col("ws") < lit(java.sql.Timestamp.from(maxTs.plusSeconds(500 * 3600L))))
        .select(col("ws").cast("timestamp_ntz").as("ws"), col("n"))
        .orderBy("ws")
    },

    // ------------------------------- custom streaming state under the gate
    Q("q57_stream_sessions",
      "flatMapGroupsWithState under the hash gate: " +
        "Streams.completedSessions (one (start,last,n) state per user, " +
        "emit-once-at-close, event-time-timeout eviction) over a file " +
        "stream of all events must reproduce the batch session islands " +
        "of q37. Sentinel users with far-future times drive the " +
        "watermark so every real session closes by timeout (timeouts " +
        "fire the batch AFTER the watermark passes — hence two sentinel " +
        "batches); boundary semantics match session_window: a gap of " +
        "EXACTLY 4h merges (close only on strictly-greater).",
      Some("""
        WITH e AS (SELECT user_id, date_trunc('second', ts::TIMESTAMP) AS tss
                   FROM events),
        g AS (SELECT user_id, tss,
                     CASE WHEN lag(tss) OVER w IS NULL
                            OR tss - lag(tss) OVER w > INTERVAL '4 hours'
                          THEN 1 ELSE 0 END AS brk
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tss)),
        s AS (SELECT user_id, tss,
                     SUM(brk) OVER (PARTITION BY user_id ORDER BY tss
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM g)
        SELECT user_id, MIN(tss) AS session_start, COUNT(*) AS n_events
        FROM s GROUP BY user_id, sid ORDER BY 1, 2""")) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("user_id"),
          date_trunc("second", col("ts")).cast("timestamp").as("tss"))
      val maxTs = ev.agg(max(col("tss"))).head().getTimestamp(0).toInstant
      val SentinelUser = 1000000000L
      streamGate(s, ev, "q57", dir) { (sc, srcDir, outDir, ckptDir) =>
        def sentinel(hoursAhead: Int): Unit =
          sc.range(1).select(lit(SentinelUser).as("user_id"),
              lit(java.sql.Timestamp.from(maxTs.plusSeconds(hoursAhead * 3600L))).as("tss"))
            .write.mode("append").parquet(srcDir)
        val sessions = Streams.completedSessions(
          Streams.eventsStream(sc, srcDir, ev.schema)
            .withWatermark("tss", "1 hour")
            .as[(Long, java.sql.Timestamp)](
              org.apache.spark.sql.Encoders.tuple(
                org.apache.spark.sql.Encoders.scalaLong,
                org.apache.spark.sql.Encoders.TIMESTAMP)),
          gapMs = 4 * 3600 * 1000L)
        val q = sessions.toDF().writeStream
          .format("parquet").option("path", outDir)
          .option("checkpointLocation", ckptDir)
          .outputMode("append").start()
        try {
          q.processAllAvailable() // batch 1: all real events into state
          sentinel(1000)
          // batch 2 ingests the sentinel; the self-run NO-DATA batch
          // applies its watermark and fires every user's event-time
          // timeout before processAllAvailable returns (one sentinel,
          // not two — see q184's contract note; r16 item 6)
          q.processAllAvailable()
        } finally q.stop()
      }
        .filter(col("user_id") < SentinelUser)
        .select(col("user_id"),
          col("session_start").cast("timestamp_ntz").as("session_start"),
          col("n_events"))
        .orderBy("user_id", "session_start")
    },

    // ----------------------------------------------------- streaming dedup
    Q("q58_stream_dedup",
      "Streaming exact dedup — the arriving-data twin of q24: the source " +
        "replays every event TWICE, and watermarked dropDuplicates on " +
        "(event_id, event time) must emit each exactly once (the " +
        "watermark bounds the dedup state store, so this runs forever at " +
        "100 TB/day; unkeyed dropDuplicates would grow state without " +
        "bound). Dedup emits rows immediately in append mode — no " +
        "sentinel flushing needed; the gate aggregates the deduped sink " +
        "and compares to batch distinct counts.",
      Some("""
        SELECT event_type, COUNT(DISTINCT event_id) AS n
        FROM events GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts").cast("timestamp").as("tss"),
          col("event_type"))
      streamGate(s, ev, "q58", dir) { (sc, srcDir, outDir, ckptDir) =>
        ev.coalesce(4).write.mode("append").parquet(srcDir) // the duplicates
        val deduped = Streams.eventsStream(sc, srcDir, ev.schema)
          .withWatermark("tss", "1 hour")
          .dropDuplicates("event_id", "tss")
        val q = deduped.writeStream
          .format("parquet").option("path", outDir)
          .option("checkpointLocation", ckptDir)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // ------------------------------- streaming dedup, jittered duplicates
    Q("q115_stream_dedup_jitter",
      "Streaming dedup when duplicates arrive with DIFFERENT event " +
        "times (producer retries re-stamping on send — the at-least-" +
        "once reality q58 can't cover): dropDuplicatesWithinWatermark " +
        "keys state on event_id ONLY and keeps the first arrival, " +
        "dropping any duplicate landing within the watermark delay; " +
        "q58's dropDuplicates(event_id, tss) would pass BOTH copies " +
        "(different event time = different key). The source replays " +
        "every event twice, the duplicate jittered +5 minutes; the sink " +
        "must hold exactly one row per event_id. Which copy is kept " +
        "depends on arrival order, so the gate aggregates only arrival-" +
        "invariant columns. State still expires at the watermark " +
        "horizon — bounded forever at 100 TB/day, same as q58.",
      Some("""
        SELECT event_type, COUNT(DISTINCT event_id) AS n_unique
        FROM events GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts").cast("timestamp").as("tss"),
          col("event_type"))
      // the duplicates: same event_id, event time jittered +5 min
      // (inside the 1 h delay, so the dedup state MUST still hold
      // them). Staged WITH the originals — the replay is one
      // deterministic source, so the duplicate-write job belongs in
      // the Scratch staging, not re-run per invocation (r17 verdict
      // item 6: only input staging leaves the timed region; the
      // stream still ingests and dedups every copy)
      val doubled = ev.unionByName(
        ev.withColumn("tss", col("tss") + expr("INTERVAL 5 MINUTES")))
      streamGate(s, doubled, "q115", dir) { (sc, srcDir, outDir, ckptDir) =>
        val deduped = Streams.eventsStream(sc, srcDir, ev.schema)
          .withWatermark("tss", "1 hour")
          .dropDuplicatesWithinWatermark("event_id")
        val q = deduped.writeStream
          .format("parquet").option("path", outDir)
          .option("checkpointLocation", ckptDir)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_unique"))
        .orderBy("event_type")
    },

    // ---------------------------------------------- stream-stream join
    Q("q73_stream_join",
      "Watermarked stream-stream interval join — the attribution shape: " +
        "every click joins the same user's views from the preceding hour. " +
        "Both sides carry watermarks and the join condition bounds event " +
        "time on both, so each side's buffered state is only the " +
        "watermark horizon (the unbounded-state trap of naive " +
        "stream-stream joins). Inner-join matches emit as they arrive — " +
        "no sentinel flushing — and the sink must equal the batch " +
        "interval join of the same table, proving the unified model for " +
        "joins like q48 proves it for aggregations. Timestamps are " +
        "second-truncated for the cross-engine compare.",
      Some("""
        WITH e AS (SELECT event_id, user_id, event_type,
                          date_trunc('second', ts::TIMESTAMP) AS tss
                   FROM events)
        SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id,
               (epoch(c.tss) - epoch(v.tss))::BIGINT AS secs_before
        FROM e c JOIN e v
          ON c.user_id = v.user_id
         AND c.event_type = 'click' AND v.event_type = 'view'
         AND v.tss <= c.tss AND v.tss >= c.tss - INTERVAL '1 hour'
        ORDER BY 1, 2""")) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          date_trunc("second", col("ts")).cast("timestamp").as("tss"))
      streamGate(s, ev, "q73", dir) { (sc, srcDir, outDir, ckptDir) =>
        val stream = Streams.eventsStream(sc, srcDir, ev.schema)
        val clicks = stream.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id").as("cu"),
            col("tss").as("click_ts"))
          .withWatermark("click_ts", "1 hour")
        val views = stream.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id").as("vu"),
            col("tss").as("view_ts"))
          // views must stay joinable a full hour longer than clicks
          .withWatermark("view_ts", "2 hours")
        val joined = clicks.join(views,
          col("cu") === col("vu") &&
            col("view_ts") <= col("click_ts") &&
            col("view_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR"))
          .select(col("click_id"), col("view_id"), col("cu").as("user_id"),
            (unix_timestamp(col("click_ts")) -
              unix_timestamp(col("view_ts"))).as("secs_before"))
        val q = Streams.parquetSink(joined, outDir, ckptDir).start()
        try q.processAllAvailable() finally q.stop()
      }
        .orderBy("click_id", "view_id")
    },

    // -------------------------------------- stream-stream LEFT OUTER join
    Q("q173_stream_left_join",
      "Watermarked stream-stream LEFT OUTER interval join — q73's " +
        "attribution shape with the unmatched clicks KEPT: a click " +
        "with no preceding-hour view emits once the joint watermark " +
        "proves no matching view can still arrive (Spark buffers the " +
        "left row until then; the null-padded result is a watermark-" +
        "driven emission, not a scan-time decision). Bounded inputs " +
        "expose the classic trap — the final rows' null matches " +
        "never flush because the watermark dies with the stream — so " +
        "the gate appends a far-future sentinel pair on BOTH sides " +
        "after the first drain (the joint watermark is the MIN across " +
        "inputs) and drains again; sentinels are excluded from the " +
        "compare. The sink must equal the batch LEFT interval join " +
        "exactly — unified-model proof for outer joins, completing " +
        "q73's inner case. view_id nulls are coalesced to -1 on both " +
        "engines (null sort order differs).",
      Some("""
        WITH e AS (SELECT event_id, user_id, event_type,
                          date_trunc('second', ts::TIMESTAMP) AS tss
                   FROM events)
        SELECT c.event_id AS click_id,
               COALESCE(v.event_id, -1) AS view_id, c.user_id
        FROM (SELECT * FROM e WHERE event_type = 'click') c
        LEFT JOIN (SELECT * FROM e WHERE event_type = 'view') v
          ON c.user_id = v.user_id
         AND v.tss <= c.tss AND v.tss >= c.tss - INTERVAL '1 hour'
        ORDER BY 1, 2""")) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          date_trunc("second", col("ts")).cast("timestamp").as("tss"))
      val maxTs = ev.agg(max("tss")).head.getTimestamp(0)
      streamGate(s, ev, "q173", dir) { (sc, srcDir, outDir, ckptDir) =>
        val stream = Streams.eventsStream(sc, srcDir, ev.schema)
        val clicks = stream.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id").as("cu"),
            col("tss").as("click_ts"))
          .withWatermark("click_ts", "1 hour")
        val views = stream.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id").as("vu"),
            col("tss").as("view_ts"))
          .withWatermark("view_ts", "2 hours")
        val joined = clicks.join(views,
          col("cu") === col("vu") &&
            col("view_ts") <= col("click_ts") &&
            col("view_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR"),
          "leftOuter")
          .select(col("click_id"), col("view_id"),
            col("cu").as("user_id"))
        val q = Streams.parquetSink(joined, outDir, ckptDir).start()
        try {
          q.processAllAvailable()
          // watermark-flush sentinels: one row per side, far future
          // and 100 days apart so they can't join each other
          import sc.implicits._
          Seq(
            (-1L, -1L, "click",
              new java.sql.Timestamp(maxTs.getTime + 200L * 86400_000L)),
            (-2L, -1L, "view",
              new java.sql.Timestamp(maxTs.getTime + 100L * 86400_000L)))
            .toDF("event_id", "user_id", "event_type", "tss")
            .coalesce(1).write.mode("append").parquet(srcDir)
          q.processAllAvailable()
        } finally q.stop()
      }
        .where(col("user_id") >= 0)
        .select(col("click_id"),
          coalesce(col("view_id"), lit(-1L)).as("view_id"),
          col("user_id"))
        .orderBy("click_id", "view_id")
    },

    // ------------------------------------------------- conversion funnel
    Q("q83_funnel",
      "Ordered conversion funnel (view → click → purchase) per (user, " +
        "day): the day's first view, the first click AT-OR-AFTER that " +
        "view, and the first purchase at-or-after that click — order " +
        "matters, so a click before any view does not advance the " +
        "funnel. Shape: three entire-partition MIN windows that all " +
        "ride ONE hash exchange on the (user, day) funnel key (each " +
        "stage's threshold is a plain column by the time the next " +
        "window needs it), then one key-level dedupe (exchange-reusing) " +
        "and a tiny stage rollup. Latency sums stay in integer epoch " +
        "seconds.",
      Some("""
        WITH e AS (SELECT user_id, date_trunc('day', ts::TIMESTAMP) AS d,
                          date_trunc('second', ts::TIMESTAMP) AS tss,
                          event_type
                   FROM events),
        v AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN tss END)
                          OVER (PARTITION BY user_id, d) AS tv FROM e),
        c AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND tss >= tv
                                 THEN tss END)
                          OVER (PARTITION BY user_id, d) AS tc FROM v),
        p AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND tss >= tc
                                 THEN tss END)
                          OVER (PARTITION BY user_id, d) AS tp FROM c),
        u AS (SELECT DISTINCT user_id, d, tv, tc, tp FROM p)
        SELECT CASE WHEN tp IS NOT NULL THEN 3
                    WHEN tc IS NOT NULL THEN 2
                    WHEN tv IS NOT NULL THEN 1
                    ELSE 0 END AS stage,
               COUNT(*) AS n_users,
               SUM(CASE WHEN tp IS NOT NULL
                        THEN epoch(tp) - epoch(tv) END)::BIGINT
                 AS total_latency_s
        FROM u GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val w = Window.partitionBy("user_id", "d")
      val secs = (c: org.apache.spark.sql.Column) =>
        c.cast("timestamp").cast("long") // NTZ→LTZ is identity at UTC
      val staged = Tables.events(s, dir)
        .select(col("user_id"), date_trunc("day", col("ts")).as("d"),
          date_trunc("second", col("ts")).as("tss"),
          col("event_type"))
        .withColumn("tv",
          min(when(col("event_type") === "view", col("tss"))).over(w))
        .withColumn("tc",
          min(when(col("event_type") === "click" && col("tss") >= col("tv"),
            col("tss"))).over(w))
        .withColumn("tp",
          min(when(col("event_type") === "purchase" && col("tss") >= col("tc"),
            col("tss"))).over(w))
      staged
        .select("user_id", "d", "tv", "tc", "tp").distinct()
        .groupBy(
          when(col("tp").isNotNull, 3)
            .when(col("tc").isNotNull, 2)
            .when(col("tv").isNotNull, 1)
            .otherwise(0).as("stage"))
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("tp").isNotNull, secs(col("tp")) - secs(col("tv"))))
            .as("total_latency_s"))
        .orderBy("stage")
    },

    // ------------------------------------------------ transition bigrams
    Q("q96_transition_bigrams",
      "Event-transition matrix (first-order Markov counts, the path- " +
        "analysis primitive): per user, lag over (second, event_id) " +
        "ordering yields each consecutive (prev → next) pair; one " +
        "global hash-agg counts the 25 transition cells and their share " +
        "per source state. The lag window and nothing else touches " +
        "per-user ordering — one user shuffle, then a tiny agg.",
      Some("""
        WITH e AS (SELECT user_id, event_type,
                          LAG(event_type) OVER
                            (PARTITION BY user_id
                             ORDER BY date_trunc('second', ts::TIMESTAMP), event_id)
                            AS prev_type
                   FROM events)
        SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        FROM e WHERE prev_type IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2""")) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("tss", "event_id")
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          date_trunc("second", col("ts")).as("tss"), col("event_id"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("prev_type", "next_type")
    },

    // -------------------------------------------------- ratio to report
    Q("q97_ratio_to_report",
      "Percent-of-total reporting (the ratio_to_report window): each " +
        "event type's share of total revenue. The corpus collapses to " +
        "its 5-row type aggregate FIRST; the global-total window then " +
        "runs over that bounded frame — the only safe place for an " +
        "unpartitioned window (same domain-bounded rule as q74's " +
        "cumulative ranks). Shares divide exact cent sums once, at the " +
        "end.",
      Some(s"""
        WITH t AS (SELECT event_type, ${oCentsSum("value")} AS cents
                   FROM events GROUP BY 1)
        SELECT event_type,
               ROUND(CAST(cents AS DOUBLE)/100, 2) AS revenue,
               ROUND(CAST(cents AS DOUBLE) * 100 / SUM(cents) OVER (), 4)
                 AS share_pct
        FROM t ORDER BY 1""")) { (s, dir) =>
      // single-partition window is SAFE here: its input is the 5-row
      // event-type aggregate, not the corpus (q74 rule)
      val w = Window.partitionBy()
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(centsSum(col("value")).as("cents"))
        .select(col("event_type"),
          round(col("cents").cast("double") / 100, 2).as("revenue"),
          round(col("cents").cast("double") * 100 / sum(col("cents")).over(w), 4)
            .as("share_pct"))
        .orderBy("event_type")
    },

    // -------------------------------------------------- retention cohorts
    Q("q89_retention_cohorts",
      "Weekly retention cohorts (the product-analytics staple): each " +
        "user's cohort is the Monday-truncated week of their FIRST " +
        "event; retention at offset k counts distinct cohort users " +
        "active k weeks later. Shape: one agg for first-seen, one " +
        "distinct (user, week) activity table, one broadcastable join " +
        "back on user, one final (cohort, offset) hash-agg — the " +
        "corpus is touched twice and never sorted globally. Offsets " +
        "stay integer (epoch div 7-day weeks on week-truncated " +
        "timestamps — exact), and both engines truncate weeks to " +
        "Monday.",
      Some("""
        WITH f AS (SELECT user_id,
                          date_trunc('week', MIN(ts)::TIMESTAMP)::TIMESTAMP AS cohort
                   FROM events GROUP BY 1),
        a AS (SELECT DISTINCT user_id,
                     date_trunc('week', ts::TIMESTAMP)::TIMESTAMP AS wk
              FROM events)
        SELECT f.cohort AS cohort_week,
               ((epoch(a.wk)::BIGINT - epoch(f.cohort)::BIGINT) // 604800)
                 AS offset_weeks,
               COUNT(*) AS n_users
        FROM a JOIN f USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2""")) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val first = ev.groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).as("cohort"))
      val active = ev
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .distinct()
      active.join(first, "user_id")
        .groupBy(col("cohort").as("cohort_week"),
          ((col("wk").cast("timestamp").cast("long") -
            col("cohort").cast("timestamp").cast("long")) / 604800L)
            .cast("long").as("offset_weeks"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "offset_weeks")
    },

    // ---------------------------------------------- time-weighted average
    Q("q90_time_weighted_avg",
      "Interval-weighted mean value per user (the telemetry/billing " +
        "aggregate where a reading holds until the next one): each " +
        "event's value is weighted by the seconds until the user's next " +
        "event (lead window; the open last interval is excluded). The " +
        "lead window and the final per-user agg share ONE user_id " +
        "shuffle; weights are integer cents x integer seconds, so " +
        "accumulation is exact at any depth and the only float is the " +
        "final guarded division.",
      Some("""
        WITH e AS (SELECT user_id, date_trunc('second', ts::TIMESTAMP) AS tss,
                          CAST(ROUND(value*100) AS BIGINT) AS cents,
                          event_id
                   FROM events),
        i AS (SELECT user_id, cents,
                     epoch(LEAD(tss) OVER w)::BIGINT - epoch(tss)::BIGINT AS dur_s
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tss, event_id))
        SELECT user_id,
               COUNT(dur_s) AS n_intervals,
               SUM(dur_s)::BIGINT AS total_s,
               CASE WHEN SUM(dur_s) > 0
                    THEN ROUND(CAST(SUM(cents * dur_s) AS DOUBLE)
                               / SUM(dur_s) / 100, 4) END AS twa
        FROM i GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("tss", "event_id")
      val e = Tables.events(s, dir)
        .select(col("user_id"), date_trunc("second", col("ts")).as("tss"),
          round(col("value") * 100).cast("long").as("cents"), col("event_id"))
        .withColumn("dur_s",
          lead(col("tss"), 1).over(w).cast("timestamp").cast("long") -
            col("tss").cast("timestamp").cast("long"))
      e.groupBy("user_id")
        .agg(count(col("dur_s")).as("n_intervals"),
          sum(col("dur_s")).as("total_s"),
          when(sum(col("dur_s")) > 0,
            round(sum(col("cents") * col("dur_s")).cast("double") /
              sum(col("dur_s")) / 100, 4)).as("twa"))
        .orderBy("user_id")
    },

    // --------------------------------------- transformWithState (state API v2)
    Q("q124_stream_transform_state",
      "Spark 4's transformWithState (the arbitrary-state API that " +
        "supersedes mapGroupsWithState, RocksDB-backed): per-user " +
        "lifetime totals in TYPED state variables — two ValueState " +
        "counters plus a MapState[event_type, count] whose per-key " +
        "point updates avoid rewriting a whole state blob per event. " +
        "The source is split on event_id parity across two separate " +
        "Trigger.AvailableNow executions sharing one checkpoint, so " +
        "most users accumulate state ACROSS a genuine query RESTART " +
        "(RocksDB state restored from the checkpoint); each run emits " +
        "a snapshot per key per processed batch into a parquet sink " +
        "and the latest emission (max n_events, strictly monotone per " +
        "key) must equal the one-shot batch GROUP BY the oracle runs " +
        "— stream == batch for the v2 state API. AvailableNow makes " +
        "the batch boundary explicit and completion awaited by query " +
        "termination; all state-store providers are force-unloaded " +
        "between the runs so run 2 MUST restore RocksDB state from the " +
        "checkpoint (a cached in-JVM provider would test less than a " +
        "real restart). The gate is self-diagnosing: it re-aggregates " +
        "the same input as a one-shot batch GROUP BY and, on ANY " +
        "per-user disagreement with the streamed reduction, throws a " +
        "bounded payload naming the divergent users, the direction " +
        "(under-drain / double-count / max-of-partials) and each sink " +
        "emission's run + per-batch delta — a silent hash mismatch in " +
        "an environment this gate can't see becomes an actionable " +
        "error instead.",
      Some(s"""
        SELECT user_id,
               COUNT(*) AS n_events,
               CAST(${oCentsSum("value")} AS BIGINT) AS cents,
               ${oCnt("event_type='click'")} AS n_click,
               ${oCnt("event_type='purchase'")} AS n_purchase
        FROM events GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      import graft.streaming.Streams.{UserEvent, UserTotals, UserTotalsProcessor}
      val ev = Tables.events(s, dir).select(
        col("event_id"), col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      val tmp = Files.createTempDirectory("q124")
      val srcDir = tmp.resolve("src").toString
      val ckpt = tmp.resolve("ckpt").toString
      val outDir = tmp.resolve("out").toString
      val sc = graft.core.Sessions.scoped(s,
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        "spark.sql.shuffle.partitions" -> "4")
      import sc.implicits._
      def half(parity: Int): Unit = ev.where(col("event_id") % 2 === parity)
        .write.mode("append").parquet(srcDir)
      // One bounded execution: process every file currently in srcDir,
      // then TERMINATE. awaitTermination (not processAllAvailable) is the
      // completion signal, so correctness no longer depends on micro-batch
      // scheduling being quiet — the batch boundary IS the run boundary.
      def run(tag: String): Unit = {
        val q = sc.readStream.schema(ev.schema).parquet(srcDir)
          .select("user_id", "event_type", "cents").as[UserEvent]
          .groupByKey(_.user_id)
          .transformWithState(new UserTotalsProcessor(tag),
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Append())
          .writeStream.format("parquet").option("path", outDir)
          .option("checkpointLocation", ckpt).outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
      }
      // Unload every cached state-store provider (what Spark's own
      // StreamTest does between tests): run 2 then CANNOT be served by
      // run 1's still-loaded in-JVM provider or its local working dir —
      // it must restore RocksDB state from the checkpoint, which is the
      // restart semantics this gate claims to prove. Also removes the
      // same-JVM race between run 1's async provider unload (which
      // deletes the local RocksDB dir) and run 2's load of that dir.
      def unloadStateStores(): Unit =
        org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      half(0); run("r1") // run 1: even event_ids
      unloadStateStores()
      half(1); run("r2") // run 2: odd ids — state restored from checkpoint
      // The result plan reads the sink files lazily; reclaim at JVM exit.
      graft.core.Fs.deleteOnExit(tmp)
      val streamed = sc.read.parquet(outDir)
        .groupBy("user_id")
        .agg(max(struct("n_events", "cents", "n_click", "n_purchase")).as("m"))
        .select(col("user_id"), col("m.n_events").as("n_events"),
          col("m.cents").as("cents"), col("m.n_click").as("n_click"),
          col("m.n_purchase").as("n_purchase"))
      // Self-diagnosis: the one-shot batch aggregate of the SAME input,
      // compared eagerly per user. Green ⇒ return the streamed plan
      // (byte-identical semantics to before); any divergence ⇒ throw a
      // bounded payload that names users, direction, and the per-run
      // emission trail — the failure mode this gate showed twice in the
      // official record (150/150 rows, hash mismatch, no error) becomes
      // observable exactly where it occurs.
      val expected = Tables.events(sc, dir).select(
        col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
        .groupBy("user_id").agg(
        count(lit(1)).as("n_events"), sum("cents").as("cents"),
        count(when(col("event_type") === "click", 1)).as("n_click"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchase"))
      val joined = streamed.as("s").join(expected.as("b"), Seq("user_id"), "full_outer")
        .where(!(col("s.n_events") <=> col("b.n_events")) ||
          !(col("s.cents") <=> col("b.cents")) ||
          !(col("s.n_click") <=> col("b.n_click")) ||
          !(col("s.n_purchase") <=> col("b.n_purchase")))
        .select(col("user_id"),
          col("s.n_events").as("sn"), col("b.n_events").as("bn"),
          col("s.cents").as("sc"), col("b.cents").as("bc"))
      val bad = joined.limit(6).collect()
      if (bad.nonEmpty) {
        val nBad = joined.count()
        def l(r: org.apache.spark.sql.Row, i: Int): String =
          if (r.isNullAt(i)) "null" else r.getLong(i).toString
        val under = bad.count(r => !r.isNullAt(1) && !r.isNullAt(2) && r.getLong(1) < r.getLong(2))
        val over = bad.count(r => !r.isNullAt(1) && !r.isNullAt(2) && r.getLong(1) > r.getLong(2))
        val ids = bad.map(_.getLong(0))
        val trail = sc.read.parquet(outDir)
          .where(col("user_id").isin(ids: _*))
          .select("user_id", "run", "d_events", "n_events", "cents")
          .orderBy("user_id", "run", "n_events").collect()
          .map(r => s"u${r.getLong(0)}:${r.getString(1)} d=${r.getLong(2)} n=${r.getLong(3)} c=${r.getLong(4)}")
          .mkString("[", "; ", "]")
        val sample = bad.map(r =>
          s"u${r.getLong(0)} stream(n=${l(r, 1)},c=${l(r, 3)}) batch(n=${l(r, 2)},c=${l(r, 4)})")
          .mkString("[", "; ", "]")
        throw new IllegalStateException(
          s"q124 streamed transformWithState reduction != batch GROUP BY: " +
            s"$nBad divergent users (sampled under-drain=$under double-count=$over; " +
            s"a run-2 snapshot whose n equals its own d means RocksDB state was NOT " +
            s"restored from the checkpoint and max(struct) picked a partial). " +
            s"sample=$sample emissions=$trail")
      }
      streamed.orderBy("user_id")
    }
  )
}
