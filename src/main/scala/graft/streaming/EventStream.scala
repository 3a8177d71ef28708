package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Structured Streaming operators over the events stream. The reference is
  * batch-only (SURVEY §2.7); these are the engine's stream-shaped
  * additions: watermarked windowed aggregation and custom sessionization
  * state via flatMapGroupsWithState. Local tests drive them with
  * parquet-as-stream + processAllAvailable.
  */
object EventStream {

  /** Watermarked tumbling-window counts/sums per event type. */
  def windowedAgg(events: DataFrame,
                  window_ : String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    events
      // parquet may carry TIMESTAMP_NTZ; watermarks need TIMESTAMP
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(start: Long, lastSeen: Long, nEvents: Long,
                                totalValue: Double)
  final case class Session(user_id: Long, start_ts: Timestamp,
                           end_ts: Timestamp, n_events: Long,
                           total_value: Double)

  /** Gap-based sessionization: a user's session closes after `gapMs` of
    * inactivity. `withTimeout=true` additionally closes idle sessions via
    * processing-time timeouts (continuous deployments); without it only
    * in-stream gaps close sessions (and bounded harnesses like
    * processAllAvailable terminate, since timeout-armed state keeps
    * scheduling empty batches forever).
    */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
                 withTimeout: Boolean = true): Dataset[Session] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (withTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, timeoutConf) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, new Timestamp(s.start),
              new Timestamp(s.lastSeen), s.nEvents, s.totalValue))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = Vector.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.nEvents + 1,
                    s.totalValue + e.value))
                case Some(s) =>
                  closed :+= Session(userId, new Timestamp(s.start),
                    new Timestamp(s.lastSeen), s.nEvents, s.totalValue)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (withTimeout) state.setTimeoutDuration(gapMs)
            }
            closed.iterator
          }
      }
  }

  /** Drive a parquet events table through the streaming engine into an
    * in-memory sink; returns the materialized result (local harness).
    */
  def runWindowedOverParquet(spark: SparkSession, path: String,
                             queryName: String = "ev_windowed"): DataFrame = {
    val schema = spark.read.parquet(path).schema
    val stream = spark.readStream.schema(schema).parquet(path)
    val q = windowedAgg(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(queryName)
  }
}
