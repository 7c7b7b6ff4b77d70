package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The reference's continuous 0.1 s-tick loop restated on Structured
  * Streaming (SURVEY §2.9: the batch round loop is the primary engine for
  * determinism; this module is the continuous-operation path for the same
  * G1 counters and O4-style session state).
  *
  * - `windowedCounts`: G1's 5-minute sliding ring buffers
  *   (pyspider-master/pyspider/libs/counter.py:51-205) as a watermarked
  *   sliding-window aggregation.
  * - `sessionized`: per-key custom state via mapGroupsWithState — the
  *   streaming analog of the processing-queue timeout (task_queue.py:161-171).
  */
object StreamingCounters {

  /** 5-minute windows sliding every 60 s, 10-minute watermark, per event
    * type — exactly counter.CounterManager's (interval × slots) semantics. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes", "60 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))

  /** G1 event-time AVERAGES, the streaming twin of the `g1_event_avg` gate:
    * same watermarked sliding windows, carrying (count, exact µ-quantized
    * integer sum) per the determinism protocol — the average is s/n,
    * reconstructible bit-identically by any consumer, and the integer sum
    * is order-independent so stream and batch agree exactly. */
  def windowedAverages(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes", "60 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 1000000).cast("long")).as("s"))

  case class EventIn(user_id: Long, event_id: Long, tsMicros: Long)
  case class SessionState(count: Long, lastTs: Long)
  case class SessionOut(user_id: Long, events: Long, closed: Boolean)

  /** Custom keyed state: counts events per user, closing the "session" when
    * 600 s pass without activity (the at-least-once requeue window). */
  def sessionized(spark: SparkSession, events: DataFrame): org.apache.spark.sql.Dataset[SessionOut] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp_ltz")).as("tsMicros"))
      .as[EventIn]
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionOut](GroupStateTimeout.NoTimeout) {
        (uid, rows, state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.tsMicros, e.event_id))
          val prev = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          var count = prev.count
          var last = prev.lastTs
          var closed = false
          sorted.foreach { e =>
            if (last != Long.MinValue && e.tsMicros - last > 600000000L) {
              closed = true; count = 0
            }
            count += 1; last = e.tsMicros
          }
          state.update(SessionState(count, last))
          SessionOut(uid, count, closed)
      }
  }

  /** Run a streaming query over a parquet directory via the file source and
    * drain it synchronously into a memory sink (hermetic local smoke). */
  def runFileStream(spark: SparkSession, dir: String, schema: StructType,
                    name: String,
                    agg: DataFrame => DataFrame = windowedCounts): StreamingQuery = {
    val src = spark.readStream.schema(schema).parquet(dir)
    agg(src).writeStream
      .outputMode(OutputMode.Append) // watermark lets append emit closed windows
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
