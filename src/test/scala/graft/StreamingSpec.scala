package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingCounters

/** Structured Streaming path: windowed counters (G1) through a real
  * streaming query over the events parquet, cross-checked against the batch
  * aggregation of the same data; plus the keyed-state session operator. */
class StreamingSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkTestBase.spark
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  test("streaming windowed counts == batch windowed counts") {
    val batchDf = spark.read.parquet(s"$dir/events.parquet")
    // the file stream source needs a DIRECTORY; stage the file into one
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = StreamingCounters.runFileStream(
      spark, streamDir.toString, batchDf.schema, "stream_g1")
    q.processAllAvailable()
    q.stop()
    // Append mode emits only watermark-closed windows; with AvailableNow over
    // a finite file the final watermark closes all but the trailing windows.
    val streamed = spark.table("stream_g1")
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("v"))
    val batch = StreamingCounters.windowedCounts(batchDf)
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("v"))
    // every streamed row must match the batch computation exactly
    assert(streamed.count() > 0)
    assert(streamed.except(batch).count() === 0)
  }

  test("streaming windowed averages == batch (quantized-integer protocol)") {
    val batchDf = spark.read.parquet(s"$dir/events.parquet")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_avg")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = StreamingCounters.runFileStream(
      spark, streamDir.toString, batchDf.schema, "stream_g1_avg",
      StreamingCounters.windowedAverages)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_g1_avg")
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("s"))
    val batch = StreamingCounters.windowedAverages(batchDf)
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("s"))
    assert(streamed.count() > 0)
    // exact (integer sums are order-independent): every emitted window row
    // equals the batch aggregation of the same data
    assert(streamed.except(batch).count() === 0)
  }

  test("keyed custom state (mapGroupsWithState) sessionizes per user") {
    val events = spark.read.parquet(s"$dir/events.parquet")
    val out = StreamingCounters.sessionized(spark, events).collect()
    assert(out.nonEmpty)
    val users = events.select(countDistinct("user_id")).as[Long].head()
    assert(out.length.toLong === users)
    assert(out.forall(_.events > 0))
  }
}
