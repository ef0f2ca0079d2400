package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams

/** Watermark/late-data semantics of the streaming wrappers, driven through
  * MemoryStream micro-batches: a row arriving behind the watermark must be
  * DROPPED, and append mode must emit a window only once its end passes
  * the watermark. */
class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumbling window + watermark drops late rows, append emits finalized windows") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sparkS.sqlContext

    val input = MemoryStream[(Timestamp, String)]
    val agg = Streams.tumblingCounts(
      input.toDF().toDF("ts", "etype"), "ts", "10 minutes", "5 minutes")
    val q = agg.writeStream
      .format("memory").queryName("tumbling_test").outputMode("append").start()
    try {
      // batch 1: two rows in [10:00,10:10), one in [10:20,10:30)
      // → watermark after the batch = 10:22 - 5m = 10:17
      input.addData(
        (ts("2024-01-01 10:00:00"), "a"),
        (ts("2024-01-01 10:05:00"), "b"),
        (ts("2024-01-01 10:22:00"), "c"))
      q.processAllAvailable()
      // batch 2: a LATE row for [10:00,10:10) — behind the 10:17 watermark
      input.addData((ts("2024-01-01 10:03:00"), "late"))
      q.processAllAvailable()
      // batch 3: advance watermark past every window end (10:40 - 5m = 10:35)
      input.addData((ts("2024-01-01 10:40:00"), "d"))
      q.processAllAvailable()

      val out = sparkS.table("tumbling_test")
        .select("ws", "n").as[(Timestamp, Long)].collect().toMap
      // late row dropped: the 10:00 window holds 2, not 3
      assert(out(ts("2024-01-01 10:00:00")) === 2L)
      assert(out(ts("2024-01-01 10:20:00")) === 1L)
      // the 10:40 window is not yet finalized → not emitted in append mode
      assert(!out.contains(ts("2024-01-01 10:40:00")))
    } finally q.stop()
  }

  test("mapGroupsWithState: per-user running spend accumulates across micro-batches") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sparkS.sqlContext

    val input = MemoryStream[(Long, Double)]
    val q = Streams.updateSink(
      Streams.runningSpend(input.toDS()), "running_spend").start()
    try {
      input.addData((1L, 10.50), (1L, 2.25), (2L, 5.00))
      q.processAllAvailable()
      input.addData((1L, 0.25)) // second micro-batch: state must carry over
      q.processAllAvailable()
      // the memory sink holds one row per update; take each user's latest
      val byUser = sparkS.table("running_spend")
        .as[(Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
      assert(byUser(1L) === ((1L, 3L, 1300L))) // 10.50+2.25+0.25 → 1300 cents
      assert(byUser(2L) === ((2L, 1L, 500L)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState: sessions emit once, at close (gap or timeout)") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sparkS.sqlContext

    val input = MemoryStream[(Long, Timestamp)]
    val sessions = Streams.completedSessions(
      input.toDF().toDF("user_id", "ts")
        .withWatermark("ts", "0 seconds")
        .as[(Long, Timestamp)],
      gapMs = 10 * 60 * 1000)
    val q = sessions.writeStream
      .format("memory").queryName("closed_sessions").outputMode("append").start()
    try {
      // user 1: two sessions split by an in-batch gap; user 2: one open session
      input.addData(
        (1L, ts("2024-01-01 09:00:00")),
        (1L, ts("2024-01-01 09:05:00")),
        (1L, ts("2024-01-01 09:30:00")), // 25m gap: closes the first session
        (2L, ts("2024-01-01 09:31:00")))
      q.processAllAvailable()
      val afterBatch1 = sparkS.table("closed_sessions")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      // only the explicitly-gapped session has closed; open ones stay in state
      assert(afterBatch1 === Set(
        (1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:05:00"), 2L)))

      // advance the watermark past last+gap for both open sessions —
      // the event-time timeout must close them (next batch fires timeouts)
      input.addData((3L, ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      input.addData((3L, ts("2024-01-01 11:00:01")))
      q.processAllAvailable()
      val closed = sparkS.table("closed_sessions")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      assert(closed.contains(
        (1L, ts("2024-01-01 09:30:00"), ts("2024-01-01 09:30:00"), 1L)))
      assert(closed.contains(
        (2L, ts("2024-01-01 09:31:00"), ts("2024-01-01 09:31:00"), 1L)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState: a within-watermark late event extends session start backwards") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sparkS.sqlContext

    val input = MemoryStream[(Long, Timestamp)]
    val sessions = Streams.completedSessions(
      input.toDF().toDF("user_id", "ts")
        .withWatermark("ts", "2 hours") // generous lateness: late rows process
        .as[(Long, Timestamp)],
      gapMs = 10 * 60 * 1000)
    val q = sessions.writeStream
      .format("memory").queryName("late_sessions").outputMode("append").start()
    try {
      input.addData((1L, ts("2024-01-01 12:00:00")), (1L, ts("2024-01-01 12:01:00")))
      q.processAllAvailable()
      // late (but within watermark) event BEFORE the open session's start
      input.addData((1L, ts("2024-01-01 11:55:00")))
      q.processAllAvailable()
      // close everything via timeout
      input.addData((9L, ts("2024-01-01 20:00:00")))
      q.processAllAvailable()
      input.addData((9L, ts("2024-01-01 20:00:01")))
      q.processAllAvailable()
      val closed = sparkS.table("late_sessions")
        .as[(Long, Timestamp, Timestamp, Long)].collect()
        .filter(_._1 == 1L)
      assert(closed.toSeq === Seq(
        (1L, ts("2024-01-01 11:55:00"), ts("2024-01-01 12:01:00"), 3L)))
    } finally q.stop()
  }

  test("session windows merge within gap and split across it (streaming)") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sparkS.sqlContext

    val input = MemoryStream[(Timestamp, Long)]
    val agg = Streams.sessionize(
      input.toDF().toDF("ts", "user_id"), "ts", "user_id",
      gap = "10 minutes", lateness = "0 seconds")
    val q = agg.writeStream
      .format("memory").queryName("session_test").outputMode("complete").start()
    try {
      input.addData(
        (ts("2024-01-01 09:00:00"), 1L), // session A…
        (ts("2024-01-01 09:05:00"), 1L), // …merges (gap 5m < 10m)
        (ts("2024-01-01 09:30:00"), 1L), // new session (gap 25m)
        (ts("2024-01-01 09:00:00"), 2L)) // other key: own session
      q.processAllAvailable()
      val out = sparkS.table("session_test")
        .select("user_id", "session_start", "n_events")
        .as[(Long, Timestamp, Long)].collect().toSet
      assert(out === Set(
        (1L, ts("2024-01-01 09:00:00"), 2L),
        (1L, ts("2024-01-01 09:30:00"), 1L),
        (2L, ts("2024-01-01 09:00:00"), 1L)))
    } finally q.stop()
  }

  test("stream-stream interval join: buffered matches emit, behind-watermark rows drop") {
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sparkS.sqlContext

    val clicks = MemoryStream[(Long, Timestamp)]
    val views = MemoryStream[(Long, Timestamp)]
    val joined = clicks.toDF().toDF("cu", "click_ts")
      .withWatermark("click_ts", "1 hour")
      .join(views.toDF().toDF("vu", "view_ts").withWatermark("view_ts", "2 hours"),
        col("cu") === col("vu") &&
          col("view_ts") <= col("click_ts") &&
          col("view_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("cu"), col("click_ts"), col("view_ts"))
    val q = joined.writeStream
      .format("memory").queryName("ss_join_test").outputMode("append").start()
    try {
      // batch 1: click + in-window view arrive together → match emits
      clicks.addData((1L, ts("2024-01-01 10:00:00")))
      views.addData((1L, ts("2024-01-01 09:30:00")))
      q.processAllAvailable()
      // batch 2: a view arriving LATER but still ahead of the watermark
      // must match the click buffered in join state
      views.addData((1L, ts("2024-01-01 09:50:00")))
      q.processAllAvailable()
      // batch 3: far-future traffic on BOTH sides advances the global
      // watermark (min across inputs) and evicts the old state
      clicks.addData((9L, ts("2024-01-01 20:00:00")))
      views.addData((9L, ts("2024-01-01 20:00:00")))
      q.processAllAvailable()
      // batch 4: a view behind the view-side watermark (18:00) is dropped
      views.addData((1L, ts("2024-01-01 09:55:00")))
      q.processAllAvailable()

      val out = sparkS.table("ss_join_test")
        .as[(Long, Timestamp, Timestamp)].collect().toSet
      assert(out === Set(
        (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 09:30:00")),
        (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 09:50:00")),
        (9L, ts("2024-01-01 20:00:00"), ts("2024-01-01 20:00:00"))))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups jittered retries; plain dropDuplicates cannot") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sparkS.sqlContext

    // the q115 scenario in miniature: event 1 arrives, then a retry of
    // the same event re-stamped +5 minutes, then an unrelated event
    def run(name: String)(dedup: org.apache.spark.sql.DataFrame
        => org.apache.spark.sql.DataFrame): Long = {
      val input = MemoryStream[(Long, Timestamp)]
      val q = dedup(input.toDF().toDF("event_id", "tss")
          .withWatermark("tss", "1 hour"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        input.addData((1L, ts("2024-01-01 10:00:00")))
        q.processAllAvailable()
        input.addData((1L, ts("2024-01-01 10:05:00")), // jittered retry
          (2L, ts("2024-01-01 10:06:00")))
        q.processAllAvailable()
        sparkS.table(name).count()
      } finally q.stop()
    }
    // keyed on id only + watermark state: the retry is recognized
    assert(run("dedup_within")(_.dropDuplicatesWithinWatermark("event_id")) === 2L,
      "jittered retry must dedup against the first arrival")
    // q58's key includes the event time: the re-stamped retry is a new key
    assert(run("dedup_exact")(_.dropDuplicates("event_id", "tss")) === 3L,
      "(id, ts)-keyed dedup cannot see a re-stamped retry as a duplicate")
  }
}
