package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Multimodal

class MultimodalSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkTestBase.spark
  import spark.implicits._

  test("magic-byte sniffing covers every decodable container") {
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, 1, 2)
    val jpg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)
    val mp4 = "....ftypisom....".getBytes("ASCII")
    val wav = "RIFFxxxxWAVE".getBytes("ASCII")
    val bmp = "BMxxxxxx".getBytes("ASCII")
    val gif = "GIF89ax".getBytes("ASCII")
    assert(Multimodal.sniffFormat(png) === "png")
    assert(Multimodal.sniffFormat(jpg) === "jpeg")
    assert(Multimodal.sniffFormat(mp4) === "mp4")
    assert(Multimodal.sniffFormat(wav) === "wav")
    assert(Multimodal.sniffFormat(bmp) === "bmp")
    assert(Multimodal.sniffFormat(gif) === "gif")
    assert(Multimodal.sniffFormat("hello".getBytes) === "bin")
  }

  test("png/bmp/gif decode is REAL: ImageIO recovers exact generator pixels") {
    for (fmt <- Seq("png", "bmp", "gif"); d <- Seq(0L, 3L, 17L, 252L)) {
      val bytes = Multimodal.synthImage(d, fmt)
      val meta = Multimodal.decode(bytes)
      val (w, h) = Multimodal.synthImageDims(d)
      assert(meta.format === fmt, s"$fmt d=$d")
      assert(meta.width === Some(w) && meta.height === Some(h), s"$fmt d=$d dims")
      // ground-truth pixel hash straight from the formula — the decoder
      // must recover every pixel exactly (all three formats are lossless
      // for this palette-bounded fixture)
      var expect = 0L
      for (y <- 0 until h; x <- 0 until w)
        expect += (Multimodal.synthRgb(d, x, y) & 0xffffff).toLong * (y.toLong * w + x + 1)
      assert(meta.pxHash === Some(expect), s"$fmt d=$d pixel hash")
      assert(meta.durationMs === None)
    }
  }

  test("wav duration is REAL RIFF arithmetic") {
    for (d <- Seq(1L, 4L, 7L, 103L)) {
      val bytes = Multimodal.synthWav(d)
      val (rate, channels, frames) = Multimodal.synthWavParams(d)
      val meta = Multimodal.decode(bytes)
      assert(meta.format === "wav")
      assert(meta.bytes === 44L + frames * channels * 2)
      // dataLen*1000/byteRate with blockAlign cancelling = frames*1000/rate
      assert(meta.durationMs === Some(frames * 1000L / rate), s"d=$d")
      assert(meta.width === None && meta.pxHash === None)
    }
    // truncated header → no duration, still typed
    assert(Multimodal.decode("RIFFxxxxWAVE".getBytes("ASCII")).durationMs === None)
  }

  test("jpeg/mp4 stay a labeled deterministic stub (codec-bound)") {
    val jpg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)
    val m1 = Multimodal.decode(jpg); val m2 = Multimodal.decode(jpg.clone())
    assert(m1 === m2 && m1.format === "jpeg" && m1.width.isDefined)
    assert(m1.pxHash === None) // no fake pixel evidence from the stub
  }

  test("frame sampling: decoded pixel rows (image) and PCM windows (wav)") {
    val d = 6L
    val png = Multimodal.synthImage(d, "png")
    val (w, h) = Multimodal.synthImageDims(d)
    val frames = Multimodal.frameSample(png, 4)
    assert(frames.length === 4)
    assert(frames.forall(_.length === w * 3)) // one packed-RGB row each
    for (i <- 0 until 4) {
      val y = (h.toLong * i / 4).toInt
      val expect = (0 until w).flatMap { x =>
        val p = Multimodal.synthRgb(d, x, y)
        Seq(((p >> 16) & 0xff).toByte, ((p >> 8) & 0xff).toByte, (p & 0xff).toByte)
      }
      assert(frames(i).toSeq === expect, s"row $i")
    }

    val dw = 7L
    val wav = Multimodal.synthWav(dw)
    val (_, channels, nFrames) = Multimodal.synthWavParams(dw)
    val dataLen = nFrames * channels * 2
    val wf = Multimodal.frameSample(wav, 4)
    assert(wf.length === 4 && wf.forall(_.length === 16))
    for (i <- 0 until 4) {
      val start = (dataLen.toLong * i / 4).toInt
      val expect = (0 until 16).map(j => ((dw * 3 + (start + j) * 7) % 256).toByte)
      assert(wf(i).toSeq === expect, s"window $i")
    }

    assert(Multimodal.frameSample(Array.emptyByteArray, 4).isEmpty)
    // undecodable → labeled slice stub, still k frames
    assert(Multimodal.frameSample("plain text payload".getBytes, 4).length === 4)
  }

  test("decodeBatch: partition-parallel, schema + batch shape") {
    val media = spark.createDataset(
      (0L until 60L).map(i => Multimodal.MediaRow(i, Multimodal.synthPayload(i, "x" * (i.toInt + 1)))))
      .repartition(4)
    val out = Multimodal.decodeBatch(media, frames = 4).collect()
    assert(out.length === 60)
    out.foreach { r =>
      val imgFmt = Map(0L -> "png", 3L -> "bmp", 4L -> "gif")
      r.doc_id % 5 match {
        case m @ (0 | 3 | 4) =>
          val (w, h) = Multimodal.synthImageDims(r.doc_id)
          assert(r.meta.format === imgFmt(m) && r.meta.width === Some(w) &&
            r.meta.height === Some(h) && r.meta.pxHash.isDefined)
        case 1 =>
          assert(r.meta.format === "wav" && r.meta.durationMs.isDefined)
        case _ =>
          assert(r.meta.format === "bin" && r.meta.width === None)
      }
      assert(r.frames.length === 4)
    }
    // empty payload → no frames, still typed
    val empty = Multimodal.decodeBatch(
      spark.createDataset(Seq(Multimodal.MediaRow(0L, Array.emptyByteArray))), 4).head()
    assert(empty.frames.isEmpty && empty.meta.bytes === 0L)
  }

  test("malformed payloads degrade instead of hanging or crashing (ADVICE r5)") {
    // 1. RIFF chunk with size in [2^31, 2^32): the old int-cast walk stepped
    //    0 bytes and spun forever; the Long walk must terminate
    val evil = new Array[Byte](64)
    "RIFF".getBytes.copyToArray(evil, 0)
    "WAVE".getBytes.copyToArray(evil, 8)
    "junk".getBytes.copyToArray(evil, 12)
    evil(16) = 0xf8.toByte; evil(17) = 0xff.toByte
    evil(18) = 0xff.toByte; evil(19) = 0xff.toByte // chunk size 0xFFFFFFF8
    val meta = Multimodal.decode(evil) // must return, quickly
    assert(meta.format === "wav" && meta.durationMs.isEmpty)
    assert(Multimodal.frameSample(evil, 4).nonEmpty) // sliceStub fallback

    // 2. truncated WAV: data chunk declares more bytes than exist — sampling
    //    must clamp to the real payload, not throw ArrayIndexOutOfBounds
    val wav = Multimodal.synthWav(7L)
    val truncated = java.util.Arrays.copyOfRange(wav, 0, 60) // 44B header + 16B
    val frames = Multimodal.frameSample(truncated, 4)
    assert(frames.length === 4)
    frames.foreach(f => assert(f.length <= 16))

    // 3. corrupt image bytes that make ImageIO THROW (not return null):
    //    a PNG magic with garbage body must yield the all-None meta
    val corrupt = new Array[Byte](32)
    corrupt(0) = 0x89.toByte; corrupt(1) = 'P'; corrupt(2) = 'N'; corrupt(3) = 'G'
    (4 until 32).foreach(i => corrupt(i) = (i * 37).toByte)
    val m = Multimodal.decode(corrupt)
    assert(m.format === "png" && m.width.isEmpty && m.pxHash.isEmpty)
    assert(Multimodal.frameSample(corrupt, 3).length === 3) // stub fallback
  }
}
