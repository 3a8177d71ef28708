package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

import java.sql.Timestamp

class EventStreamSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("watermarked windowed aggregation over parquet-as-stream matches batch") {
    // the streaming file source needs a directory
    val dir = java.nio.file.Files.createTempDirectory("events").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val streamed = EventStream.runWindowedOverParquet(spark, dir, "ev_test")
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    val batch = EventStream.windowedAgg(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stateful sessionization closes sessions on gaps") {
    def ev(id: Long, user: Long, minute: Long) =
      EventStream.Event(id, new Timestamp(minute * 60000L), user, "click", 1.0)
    // user 1: two bursts separated by > 30min; user 2: one burst
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.Event](
      spark, numPartitions = 1)
    input.addData(
      ev(1, 1, 0), ev(2, 1, 5), ev(3, 1, 10),
      ev(4, 1, 120), ev(5, 1, 125),
      ev(6, 2, 50), ev(7, 2, 55))
    // one micro-batch: only sessions closed WITHIN the batch (by a later
    // event after the gap) are emitted
    val sessions = EventStream.sessionize(input.toDS(), withTimeout = false)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_test").start()
    try q.processAllAvailable() finally q.stop()
    val closed = spark.table("sessions_test").as[EventStream.Session].collect()
    // user 1's first burst closed by the 120-minute event
    assert(closed.length == 1)
    assert(closed(0).user_id == 1L && closed(0).n_events == 3L)
    assert(closed(0).end_ts.getTime == 10 * 60000L)
  }
}
