package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder prompt): media payloads are opaque
  * `binary` columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run batch-wise over partitions.
  *
  * The actual codecs are NOT in this container, so the decode step is a
  * clearly-marked DETERMINISTIC STUB (`stubDecode`): it derives plausible
  * metadata purely from the bytes, so the Spark-side plumbing — schema,
  * batch shape, partitioning, null handling — is real and testable, and a
  * codec can be dropped in without touching the pipeline.
  */
object Multimodal {

  case class MediaMeta(
      format: String, // sniffed from magic bytes (real) or stubbed
      bytes: Long,
      width: Int, // STUB: no image codec in the container
      height: Int, // STUB
      durationMs: Long) // STUB (audio/video)

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class DecodedRow(doc_id: Long, meta: MediaMeta, frames: Seq[Array[Byte]])

  /** Real part: container sniffing from magic bytes. */
  def sniffFormat(bytes: Array[Byte]): String = {
    if (bytes.length >= 8 &&
      (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') "png"
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
    else if (bytes.length >= 12 && bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p') "mp4"
    else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F') "wav"
    else "bin"
  }

  /** STUB decode — deterministic fake in place of the missing codec.
    * Metadata is a pure function of the payload so tests are exact. */
  def stubDecode(bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    MediaMeta(
      format = sniffFormat(bytes),
      bytes = n.toLong,
      width = 100 + (n % 400),
      height = 100 + ((n / 7) % 300),
      durationMs = (n % 60000).toLong)
  }

  /** STUB frame sampling: k deterministic byte slices standing in for
    * decoded frames (real implementation: codec keyframe extraction). */
  def stubFrameSample(bytes: Array[Byte], k: Int): Seq[Array[Byte]] = {
    val n = bytes.length
    if (n == 0 || k <= 0) Nil
    else (0 until k).map { i =>
      val start = (n.toLong * i / k).toInt
      java.util.Arrays.copyOfRange(bytes, start, math.min(n, start + 16))
    }
  }

  /** The batch pipeline: partition-parallel decode of a binary column.
    * This is the Spark-side shape a Pandas-UDF/mapInPandas implementation
    * would have — batch in, batch out, no driver involvement. */
  def decodeBatch(media: Dataset[MediaRow], frames: Int)
                 (implicit spark: SparkSession): Dataset[DecodedRow] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        DecodedRow(m.doc_id, stubDecode(m.payload), stubFrameSample(m.payload, frames))
      }
    }
  }

  /** Column-level variants (codegen-friendly composition over built-ins for
    * everything the stub can express as expressions). */
  def metaColumns(payload: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] = {
    val n = length(payload).cast("long")
    Seq(
      n.as("bytes"),
      (lit(100) + n % 400).cast("int").as("width"),
      (lit(100) + (n / 7) % 300).cast("int").as("height"),
      (n % 60000).as("duration_ms"))
  }
}
