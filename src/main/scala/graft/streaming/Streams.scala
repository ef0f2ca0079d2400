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

  /** Sink for stateful update streams (memory/console debugging). */
  def updateSink[T](ds: Dataset[T], queryName: String): DataStreamWriter[T] =
    ds.writeStream.format("memory").queryName(queryName)
      .outputMode(OutputMode.Update())

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
