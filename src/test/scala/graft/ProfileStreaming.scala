package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Dev-only streaming throughput + state-size micro-bench (Test/runMain)
  * — the r7 review's missing evidence: every stateful op proves
  * equals-batch bit-for-bit (StreamingSpec), but nothing recorded
  * sustained rows/s or state-store size. Protocol:
  *
  * - Input: the sf0.1 events fixture (100k rows, 1.5k users), globally
  *   time-ordered, replicated SPARK_GRAFT_REPL× with disjoint user/event
  *   ids (state GROWS with the replica factor; timestamps unchanged, so
  *   watermark progression is the fixture's own).
  * - Two input rates per op: the same N rows drained in 20 micro-batches
  *   ("steady") and in 2 micro-batches ("burst") — per-batch overhead vs
  *   bulk throughput.
  * - Metrics: wall-clock rows/s over the full drain (MemoryStream +
  *   processAllAvailable, so ingestion is never the bottleneck), and the
  *   final state-store footprint from StreamingQueryProgress
  *   (stateOperators: numRowsTotal + memoryUsedBytes).
  *
  * Ops: sessionize (flatMapGroupsWithState + event-time timeout),
  * scd2Stream (per-user open-interval state, no timeout),
  * dailyUserSketchStream (per-day bottom-k typed aggregator, complete
  * mode), classifierScoreStream (stateless stream-static inference).
  */
object ProfileStreaming {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repl = sys.env.getOrElse("SPARK_GRAFT_REPL", "4").toInt
    val spark = GraftSession
      .builder(appName = "graft-stream-bench", master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val raw = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(1), r.getString(3), r.getDouble(4)))
      .sortBy(e => (e._3, e._1))
    def toEvent(e: (Long, Long, Long, String, Double), rep: Int): Event = {
      val micros = e._3 / 1000
      val ts = new Timestamp(micros / 1000)
      ts.setNanos(((micros % 1000000) * 1000).toInt)
      Event(e._1 + rep * 100000000L, ts, e._2 + rep * 10000000L, e._4, e._5)
    }
    // interleave replicas at each time point so per-user order is kept
    val feed: IndexedSeq[Event] =
      raw.toIndexedSeq.flatMap(e => (0 until repl).map(r => toEvent(e, r)))
    println(s"[stream] feed rows=${feed.length} (fixture ${raw.length} x $repl)")

    // the late-audit op consumes rows in ARRIVAL order (its derived
    // delayed-client schedule), not event-time order
    lazy val feedArrival: IndexedSeq[Event] = feed.sortBy { e =>
      val m = e.ts.getTime / 1000 * 1000000L + e.ts.getNanos / 1000
      (m + (if (e.user_id % 17 == 3) 7200L * 1000000L else 0L), e.event_id)
    }

    def drain(label: String, nBatches: Int,
        rows: IndexedSeq[Event] = feed)(
        start: MemoryStream[Event] => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val input = MemoryStream[Event]
      val q = start(input)
      val batchSize = math.max(1, rows.length / nBatches)
      System.gc()
      val t0 = System.nanoTime()
      rows.grouped(batchSize).foreach { b =>
        input.addData(b)
        q.processAllAvailable()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      val so = Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
      val stateRows = so.map(_.numRowsTotal).sum
      val stateMb = so.map(_.memoryUsedBytes).sum / 1024.0 / 1024.0
      println(f"[stream] $label%-28s batches=$nBatches%2d rows/s=${rows.length / secs}%,.0f " +
        f"wall=$secs%.1f s stateRows=$stateRows%,d stateMem=$stateMb%.1f MiB")
      q.stop()
    }

    // classifier model: trained once offline (the deployment shape)
    val w = graft.operators.Curation
      .qualityClassifierWeights(Tables.documents(spark, sfDir))
      .select(col("b"), col("w_micro")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq

    var uniq = 0
    def qn(): String = { uniq += 1; s"sbench_$uniq" }
    for (nBatches <- Seq(20, 2)) {
      drain("sessionize", nBatches) { in =>
        EventStreams.sessionize(in.toDS()).writeStream
          .outputMode("append").format("memory").queryName(qn()).start()
      }
      drain("scd2Stream", nBatches) { in =>
        EventStreams.scd2Stream(in.toDS()).writeStream
          .outputMode("append").format("memory").queryName(qn()).start()
      }
      drain("dailyUserSketchStream", nBatches) { in =>
        EventStreams.dailyUserSketchStream(in.toDS()).writeStream
          .outputMode("complete").format("memory").queryName(qn()).start()
      }
      drain("classifierScoreStream", nBatches) { in =>
        EventStreams.classifierScoreStream(
          in.toDS().select(col("event_id").as("doc_id"),
            col("event_type").as("source"),
            concat_ws(" ", col("event_type"), col("value").cast("string"),
              col("user_id").cast("string")).as("text")), w)
          .writeStream.outputMode("append").format("memory").queryName(qn()).start()
      }
      drain("lateAuditStream", nBatches, feedArrival) { in =>
        EventStreams.lateAuditStream(in.toDS()).writeStream
          .outputMode("append").format("memory").queryName(qn()).start()
      }
    }
    spark.stop()
  }
}
