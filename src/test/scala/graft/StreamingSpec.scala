package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Events
import graft.sources.Tables
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

class StreamingSpec extends GraftSuite {

  test("streaming hourly agg over replayed fixture == batch hourly agg") {
    // stream the parquet fixture via AvailableNow into a complete-mode
    // memory sink, then compare with the batch operator
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sf)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val q = stream
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("hour_epoch"), col("event_type"), col("n"))
      .writeStream.outputMode("complete").format("memory").queryName("hourly_replay")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("hourly_replay")
      .select("hour_epoch", "event_type", "n")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = Events.hourlyAgg(Tables.events(spark, sf))
      .select("hour_epoch", "event_type", "n")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("stateful sessionize: gap splits sessions, state persists across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = EventStreams.sessionize(input.toDS(), gapSeconds = 1800L)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()

    def ev(id: Long, tsSec: Long, user: Long, v: Double) =
      Event(id, new Timestamp(tsSec * 1000), user, "click", v)

    // batch 1: user 1 has two events 10min apart (one open session)
    input.addData(ev(1, 1000, 1, 1.0), ev(2, 1600, 1, 2.0))
    q.processAllAvailable()
    assert(spark.table("sessions_out").count() === 0) // still open

    // batch 2: >30min gap closes the first session, opens a second
    input.addData(ev(3, 5000, 1, 4.0))
    q.processAllAvailable()
    val closed = spark.table("sessions_out").as[EventStreams.SessionOut].collect()
    q.stop()
    assert(closed.length === 1)
    assert(closed(0).user_id === 1L)
    assert(closed(0).session_start_epoch === 1000L)
    assert(closed(0).n_events === 2L)
    assert(closed(0).total_value === 3.0)
  }
}
