package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Structured Streaming wiring for the event-time operators.
  *
  * The aggregation bodies are the same `window`/`session_window`
  * expressions the batch queries use (graft.queries.WindowOps) — Spark's
  * unified model means a transform written against a batch DataFrame runs
  * unchanged on a stream; only the source (`readStream`), the watermark,
  * and the sink differ. That is the engine's late-data contract:
  * watermark-bounded state, not unbounded buffering (the 100 TB stream
  * would otherwise OOM its state store).
  */
object Streams {

  /** Streaming source over a parquet directory of events (streaming scans
    * require an explicit schema — inference would race file discovery). */
  def eventsStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Tumbling event-time counts with a watermark: rows later than
    * `lateness` behind the max seen event time are dropped and their
    * windows finalized (append-mode emission).
    *
    * NOTE: `withWatermark` requires a TIMESTAMP (with-local-tz) event-time
    * column — Spark rejects TIMESTAMP_NTZ with
    * [EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]. Callers feeding the NTZ
    * `events.ts` must convert (e.g. `timestamp_micros(raw div 1000)`)
    * before watermarking. */
  def tumblingCounts(events: DataFrame, tsCol: String, windowLen: String,
                     lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("window.end").as("we"), col("n"))

  /** Gap-based per-key sessionization under a watermark. */
  def sessionize(events: DataFrame, tsCol: String, keyCol: String,
                 gap: String, lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("session_window.start").as("session_start"),
        col("n_events"))

  /** Running per-user spend tracker — custom streaming state beyond what
    * windowed aggregation expresses: each key keeps (n_events, total
    * cents) across micro-batches and emits an updated snapshot per batch;
    * processing-time timeout evicts idle keys so state stays bounded
    * (the mapGroupsWithState pattern for arbitrary per-key state). */
  final case class UserSpend(user_id: Long, n_events: Long, total_cents: Long)

  /** `idleTimeout=Some(d)` evicts idle keys after `d` of processing time —
    * NOTE it also makes the engine fire continuous empty micro-batches to
    * check timeouts (don't enable it under processAllAvailable-style test
    * drivers); None keeps state until the query ends. */
  def runningSpend(events: Dataset[(Long, Double)],
                   idleTimeout: Option[String] = None): Dataset[UserSpend] = {
    import events.sparkSession.implicits._
    val timeoutConf = if (idleTimeout.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events.groupByKey(_._1)
      .mapGroupsWithState[UserSpend, UserSpend](timeoutConf) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserSpend]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            val prev = state.getOption.getOrElse(UserSpend(user, 0L, 0L))
            val (n, cents) = rows.foldLeft((prev.n_events, prev.total_cents)) {
              case ((c, s), (_, v)) => (c + 1, s + math.round(v * 100))
            }
            val next = UserSpend(user, n, cents)
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            next
          }
      }
  }

  /** A CLOSED user session: emitted exactly once, when the gap passes —
    * either observed directly (a later in-batch event beyond the gap) or
    * enforced by the event-time timeout once the watermark crosses
    * `last + gap`. */
  final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                                 session_end: java.sql.Timestamp, n_events: Long)
  /** Public: the state encoder's generated code instantiates it. */
  final case class SessionState(start: Long, last: Long, n: Long)

  /** Gap-based sessionization via flatMapGroupsWithState — the
    * event-driven emission pattern `session_window` cannot express:
    * each session is emitted ONCE, at close, rather than re-aggregated
    * per batch. State per key is one (start,last,n) triple; the
    * event-time timeout (watermark-driven) closes idle sessions, so
    * state is bounded and no session hangs open forever.
    *
    * Input: (user_id, event time), MUST carry a watermark (event-time
    * timeouts require one). */
  def completedSessions(events: Dataset[(Long, java.sql.Timestamp)],
                        gapMs: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    def close(user: Long, st: SessionState) = ClosedSession(user,
      new java.sql.Timestamp(st.start), new java.sql.Timestamp(st.last), st.n)
    events.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val done = close(user, state.get)
            state.remove()
            Iterator(done)
          } else {
            // per-batch rows arrive unordered; sort in memory (bounded by
            // the micro-batch slice of one key). A within-watermark late
            // event merges in BOTH directions (it may extend the open
            // session's start backwards); one that predates the open
            // session by more than the gap is its own earlier island and
            // closes immediately. Residual approximation: an event that
            // would BRIDGE that earlier island to a still-later one in a
            // future batch is already emitted — exact reconstruction
            // under arbitrary reordering needs buffered-event state.
            val ts = rows.map(_._2.getTime).toSeq.sorted
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            ts.foreach { t =>
              cur = cur match {
                case Some(st) if t > st.last + gapMs =>
                  closed ::= close(user, st)
                  Some(SessionState(t, t, 1))
                case Some(st) if t < st.start - gapMs =>
                  closed ::= close(user, SessionState(t, t, 1))
                  Some(st)
                case Some(st) =>
                  Some(SessionState(math.min(st.start, t),
                    math.max(st.last, t), st.n + 1))
                case None => Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(st.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Sink for stateful update streams (memory/console debugging). */
  def updateSink[T](ds: Dataset[T], queryName: String): DataStreamWriter[T] =
    ds.writeStream.format("memory").queryName(queryName)
      .outputMode(OutputMode.Update())

  /** Input/output rows of [[UserTotalsProcessor]]. `run` and `d_events`
    * are pure provenance (which execution emitted the snapshot and how
    * many rows THAT batch contributed) — they make every sink emission
    * attributable post-hoc when the streamed reduction is audited against
    * the one-shot batch aggregate; the gate's result projection drops
    * them, so they never reach the oracle compare. */
  case class UserEvent(user_id: Long, event_type: String, cents: Long)
  case class UserTotals(user_id: Long, n_events: Long, cents: Long,
      n_click: Long, n_purchase: Long, run: String, d_events: Long)

  /** `transformWithState` processor (the arbitrary-state API that
    * supersedes mapGroupsWithState): per-user lifetime totals held in
    * TYPED state variables — two `ValueState` counters plus a
    * `MapState[event_type, count]`, a composite the single state object
    * of `mapGroupsWithState` cannot update incrementally (every change
    * there rewrites the whole blob; `MapState` point-updates one key,
    * which is the difference between O(1) and O(|state|) per event once
    * per-user state grows). Runs only on the RocksDB state store
    * provider; emits the updated snapshot per key per batch, so the
    * LATEST emission (max n_events — strictly monotone) is the lifetime
    * total the batch oracle reproduces with one GROUP BY. */
  class UserTotalsProcessor(runTag: String)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, UserEvent, UserTotals] {
    import org.apache.spark.sql.{Encoders => E}
    import org.apache.spark.sql.streaming.{MapState, TTLConfig, TimeMode, TimerValues, ValueState}

    @transient private var nEvents: ValueState[Long] = _
    @transient private var cents: ValueState[Long] = _
    @transient private var byType: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      nEvents = getHandle.getValueState[Long](
        "n_events", E.scalaLong, TTLConfig.NONE)
      cents = getHandle.getValueState[Long](
        "cents", E.scalaLong, TTLConfig.NONE)
      byType = getHandle.getMapState[String, Long](
        "by_type", E.STRING, E.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
        tv: TimerValues): Iterator[UserTotals] = {
      val n0 = if (nEvents.exists()) nEvents.get() else 0L
      var n = n0
      var c = if (cents.exists()) cents.get() else 0L
      rows.foreach { e =>
        n += 1
        c += e.cents
        val prev =
          if (byType.containsKey(e.event_type)) byType.getValue(e.event_type)
          else 0L
        byType.updateValue(e.event_type, prev + 1)
      }
      nEvents.update(n)
      cents.update(c)
      def t(k: String) = if (byType.containsKey(k)) byType.getValue(k) else 0L
      Iterator.single(
        UserTotals(key, n, c, t("click"), t("purchase"), runTag, n - n0))
    }
  }

  /** Append-mode parquet sink with a checkpoint — the distributed
    * replacement for the reference's collect-to-driver single-file write
    * (/root/reference/src/Criptografia.py:175-183). */
  def parquetSink(df: DataFrame, outDir: String, checkpointDir: String): DataStreamWriter[Row] =
    df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
}
