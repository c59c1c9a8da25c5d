package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStreamOps
import graft.streaming.EventStreamOps.Event

/** Streaming semantics: watermark drops late data; stateful sessionization
  * closes sessions on gap. */
class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, t: String, user: Long = 1L): Event =
    Event(id, Timestamp.valueOf(t), user, "click", 1.0)

  test("windowed counts with watermark: in-order data aggregates per hour") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStreamOps.windowedCounts(stream.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(
        ev(1, "2024-01-01 10:05:00"), ev(2, "2024-01-01 10:55:00"),
        ev(3, "2024-01-01 11:10:00"))
      q.processAllAvailable()
      // advance watermark far enough to finalize hours 10 and 11
      stream.addData(ev(4, "2024-01-01 14:30:00"))
      q.processAllAvailable()
      stream.addData(ev(5, "2024-01-01 23:00:00"))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select($"window_start".cast("string"), $"n_events").as[(String, Long)]
        .collect().toMap
      assert(rows("2024-01-01 10:00:00") == 2L)
      assert(rows("2024-01-01 11:00:00") == 1L)
    } finally q.stop()
  }

  test("unified API: streaming window counts over the events fixture match batch") {
    import org.apache.spark.sql.types._
    val dir = sf()
    // file-stream the fixture with the same nanos→micros conversion the
    // batch loader applies (Tables.load)
    val rawSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // the file-stream source wants a directory; stage the fixture into one
    val staged = java.nio.file.Files.createTempDirectory("ev_stream_src")
    java.nio.file.Files.createSymbolicLink(
      staged.resolve("events.parquet"), java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = spark.readStream.schema(rawSchema)
      .parquet(staged.toString)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    val q = EventStreamOps.windowedCounts(stream, "1 day", "0 seconds")
      .writeStream.format("memory").queryName("ev_stream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("ev_stream")
      .select($"window_start".cast("date").cast("string"), $"event_type", $"n_events")
      .as[(String, String, Long)].collect().toSet
    val batch = graft.relational.EventsAnalytics.tumblingWindow(spark, dir)
      .select($"day".cast("string"), $"event_type", $"n_events")
      .as[(String, String, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("sessionize: gap splits sessions; in-batch ordering is by (ts, id)") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStreamOps.sessionize(stream.toDS(), gapMs = 10 * 60 * 1000L)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // one user, two bursts separated by > gap: first session closes as
      // soon as the second burst arrives (no timeout needed)
      stream.addData(
        ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:05:00"))
      q.processAllAvailable()
      stream.addData(ev(3, "2024-01-01 12:00:00"))
      q.processAllAvailable()
      val sessions = spark.table("sess_out")
        .select($"user_id", $"n_events").as[(Long, Long)].collect()
      assert(sessions.toSeq == Seq((1L, 2L)))
    } finally q.stop()
  }
}
