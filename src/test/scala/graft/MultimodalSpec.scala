package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Multimodal

class MultimodalSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkTestBase.spark
  import spark.implicits._

  test("magic-byte sniffing is real; metadata stub is deterministic") {
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, 1, 2)
    val jpg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)
    val mp4 = "....ftypisom....".getBytes("ASCII")
    val wav = "RIFF....WAVE".getBytes("ASCII")
    assert(Multimodal.sniffFormat(png) === "png")
    assert(Multimodal.sniffFormat(jpg) === "jpeg")
    assert(Multimodal.sniffFormat(mp4) === "mp4")
    assert(Multimodal.sniffFormat(wav) === "wav")
    assert(Multimodal.sniffFormat("hello".getBytes) === "bin")
    assert(Multimodal.stubDecode(png) === Multimodal.stubDecode(png.clone()))
  }

  test("decodeBatch: partition-parallel, schema + batch shape") {
    val media = spark.createDataset(
      (0L until 100L).map(i => Multimodal.MediaRow(i, ("x" * (i.toInt + 1)).getBytes)))
      .repartition(4)
    val out = Multimodal.decodeBatch(media, frames = 3).collect()
    assert(out.length === 100)
    out.foreach { d =>
      assert(d.meta.bytes === d.doc_id + 1)
      assert(d.frames.length === 3)
      assert(d.frames.forall(_.length <= 16))
    }
    // empty payload → no frames, still typed
    val empty = Multimodal.decodeBatch(
      spark.createDataset(Seq(Multimodal.MediaRow(0L, Array.emptyByteArray))), 3).head()
    assert(empty.frames.isEmpty && empty.meta.bytes === 0L)
  }
}
