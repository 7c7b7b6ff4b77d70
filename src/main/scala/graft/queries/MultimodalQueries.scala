package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Multimodal
import Q.table

/** Multimodal-column gates over REAL decode (VERDICT r4 item 1).
  *
  * Fixture: a deterministic media payload per `documents` row —
  * doc_id % 5 == 0 → a real PNG (ImageIO-encoded synthetic image),
  *           == 1 → a real 16-bit-PCM WAV,
  *           == 2 → raw text bytes (undecodable control group),
  *           == 3 → a real BMP, == 4 → a real GIF (every JDK-decodable
  *                  container appears under the gate; all lossless for the
  *                  palette-bounded fixture).
  * The Spark side runs the full encode → sniff → ImageIO-decode / RIFF-walk
  * path; the DuckDB oracle replays the GENERATOR's ground truth (dimensions,
  * pixel formula, PCM byte formula) in pure SQL arithmetic — so a decoder
  * that faked any value would hash-mismatch.
  *
  * Shared SQL fragments mirror `Multimodal.synthRgb` / `synthImageDims` /
  * `synthWavParams` exactly; keep them in sync. */
object MultimodalQueries {

  // ground-truth twins of the Scala generator arithmetic
  private val PNG_W = "CAST(8 + d.doc_id % 9 AS INTEGER)"
  private val PNG_H = "CAST(8 + d.doc_id % 7 AS INTEGER)"
  // packed rgb at (x, y) for doc d — synthRgb's exact formula
  private def rgbSql(d: String, x: String, y: String): String =
    s"(($x*31 + $y*17 + $d*7) % 256) * 65536 + (($x*13 + $y*29 + $d*5) % 256) * 256 + (($x*7 + $y*11 + $d*3) % 256)"

  val all: Seq[Q] = Seq(

    // REAL decoded metadata: width/height + position-weighted pixel hash
    // from ImageIO (png), duration from RIFF fmt/data arithmetic (wav),
    // all-NULL for the undecodable control rows. bytes is oracle-checkable
    // for wav (44 + data) and bin (octet length) but not for png (deflate
    // output size isn't SQL-replayable) — NULLed there on both sides.
    Q("mm_decode_meta",
      s"""WITH d AS (SELECT doc_id, text FROM documents),
         | px AS (
         |  SELECT d.doc_id,
         |    CAST(SUM(CAST((${rgbSql("d.doc_id", "x.x", "y.y")}) AS BIGINT)
         |             * (y.y * ($PNG_W) + x.x + 1)) AS BIGINT) AS px_hash
         |  FROM d, range(0, 16) x(x), range(0, 14) y(y)
         |  WHERE d.doc_id % 5 IN (0, 3, 4) AND x.x < ($PNG_W) AND y.y < ($PNG_H)
         |  GROUP BY d.doc_id)
         | SELECT d.doc_id,
         |  CASE d.doc_id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' WHEN 2 THEN 'bin'
         |    WHEN 3 THEN 'bmp' ELSE 'gif' END AS format,
         |  CASE d.doc_id % 5
         |    WHEN 1 THEN CAST(44 + (100 + d.doc_id % 400) * (1 + d.doc_id % 2) * 2 AS BIGINT)
         |    WHEN 2 THEN CAST(strlen(d.text) AS BIGINT) END AS bytes,
         |  CASE WHEN d.doc_id % 5 IN (0, 3, 4) THEN $PNG_W END AS width,
         |  CASE WHEN d.doc_id % 5 IN (0, 3, 4) THEN $PNG_H END AS height,
         |  CASE WHEN d.doc_id % 5 = 1 THEN CAST(
         |    (100 + d.doc_id % 400) * 1000 // (8000 + ((d.doc_id // 5) % 5) * 4000)
         |    AS BIGINT) END AS duration_ms,
         |  px.px_hash
         | FROM d LEFT JOIN px ON px.doc_id = d.doc_id""".stripMargin)(
      (s, dir) => {
        import s.implicits._
        implicit val sp: org.apache.spark.sql.SparkSession = s
        val media = table(s, dir, "documents").select("doc_id", "text")
          .as[(Long, String)]
          .map { case (d, t) => Multimodal.MediaRow(d, Multimodal.synthPayload(d, t)) }
        Multimodal.decodeBatch(media, frames = 4)
          .select(col("doc_id"), col("meta.format").as("format"),
            // image encoded sizes are real but not oracle-replayable
            // (deflate/palette output length) — masked for the compare
            when(col("meta.format").isin("png", "bmp", "gif"),
              lit(null).cast("long"))
              .otherwise(col("meta.bytes")).as("bytes"),
            col("meta.width").as("width"), col("meta.height").as("height"),
            col("meta.durationMs").as("duration_ms"),
            col("meta.pxHash").as("px_hash"))
      }),

    // REAL frame sampling: k=4 decoded pixel rows (png) / PCM windows (wav)
    // / labeled byte-slice stub (bin). frames_hash = Σ unsigned bytes across
    // frames, replayed by the oracle from the generator formulas — NULL for
    // the stub path (text octets aren't SQL-replayable).
    Q("mm_frame_sample",
      s"""WITH d AS (SELECT doc_id, text FROM documents),
         | imgf AS (
         |  SELECT d.doc_id, CAST(SUM(
         |    ((x.x*31 + (($PNG_H) * i.i // 4)*17 + d.doc_id*7) % 256) +
         |    ((x.x*13 + (($PNG_H) * i.i // 4)*29 + d.doc_id*5) % 256) +
         |    ((x.x*7  + (($PNG_H) * i.i // 4)*11 + d.doc_id*3) % 256)
         |   ) AS BIGINT) AS fh
         |  FROM d, range(0, 16) x(x), range(0, 4) i(i)
         |  WHERE d.doc_id % 5 IN (0, 3, 4) AND x.x < ($PNG_W)
         |  GROUP BY d.doc_id),
         | wavf AS (
         |  SELECT d.doc_id, CAST(SUM(
         |    (d.doc_id*3 + (((100 + d.doc_id % 400) * (1 + d.doc_id % 2) * 2)
         |       * i.i // 4 + j.j) * 7) % 256
         |   ) AS BIGINT) AS fh
         |  FROM d, range(0, 4) i(i), range(0, 16) j(j)
         |  WHERE d.doc_id % 5 = 1
         |  GROUP BY d.doc_id)
         | SELECT d.doc_id,
         |  CASE d.doc_id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' WHEN 2 THEN 'bin'
         |    WHEN 3 THEN 'bmp' ELSE 'gif' END AS format,
         |  CAST(CASE WHEN d.doc_id % 5 = 2 AND strlen(d.text) = 0 THEN 0 ELSE 4 END AS INTEGER) AS n_frames,
         |  COALESCE(imgf.fh, wavf.fh) AS frames_hash
         | FROM d LEFT JOIN imgf ON imgf.doc_id = d.doc_id
         |        LEFT JOIN wavf ON wavf.doc_id = d.doc_id""".stripMargin)(
      (s, dir) => {
        import s.implicits._
        implicit val sp: org.apache.spark.sql.SparkSession = s
        val media = table(s, dir, "documents").select("doc_id", "text")
          .as[(Long, String)]
          .map { case (d, t) => Multimodal.MediaRow(d, Multimodal.synthPayload(d, t)) }
        Multimodal.decodeBatch(media, frames = 4)
          .map { r =>
            val hash: Option[Long] = r.meta.format match {
              case "png" | "bmp" | "gif" | "wav" =>
                Some(r.frames.map(f => f.map(b => (b & 0xff).toLong).sum).sum)
              case _ => None
            }
            (r.doc_id, r.meta.format, r.frames.length, hash)
          }
          .toDF("doc_id", "format", "n_frames", "frames_hash")
      })
  )
}
