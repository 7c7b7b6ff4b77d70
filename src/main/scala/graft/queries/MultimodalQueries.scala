package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Multimodal
import Q.table

/** Multimodal-column plumbing as gate queries: `documents.text` bytes stand
  * in for an opaque media payload (the container ships no codecs — decode is
  * the deterministic stub, see graft.functions.Multimodal). */
object MultimodalQueries {

  val all: Seq[Q] = Seq(

    // typed metadata off a binary column (column-level, codegen'd);
    // DuckDB oracle via byte-length arithmetic (strlen = octet length)
    Q("mm_decode_meta",
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS bytes,
        | CAST(100 + strlen(text) % 400 AS INTEGER) AS width,
        | CAST(100 + (strlen(text) // 7) % 300 AS INTEGER) AS height,
        | CAST(strlen(text) % 60000 AS BIGINT) AS duration_ms
        | FROM documents""".stripMargin)(
      (s, dir) => table(s, dir, "documents").select(
        col("doc_id") +: Multimodal.metaColumns(col("text").cast("binary")): _*)),

    // partition-parallel stub decode + frame sampling (typed mapPartitions
    // batch shape). The stub is deterministic, so the oracle replays it in
    // SQL: format = magic-byte sniff over hex(UTF-8 bytes) in sniffFormat's
    // exact order+guards; n_frames = 0 iff the payload is empty, else k=4.
    Q("mm_frame_sample",
      """SELECT doc_id,
        | CASE
        |  WHEN strlen(text) >= 8  AND substring(hex(encode(text)), 1, 8) = '89504E47' THEN 'png'
        |  WHEN strlen(text) >= 3  AND substring(hex(encode(text)), 1, 4) = 'FFD8' THEN 'jpeg'
        |  WHEN strlen(text) >= 12 AND substring(hex(encode(text)), 9, 8) = '66747970' THEN 'mp4'
        |  WHEN strlen(text) >= 4  AND substring(hex(encode(text)), 1, 8) = '52494646' THEN 'wav'
        |  ELSE 'bin' END AS format,
        | CAST(strlen(text) AS BIGINT) AS bytes,
        | CAST(CASE WHEN strlen(text) = 0 THEN 0 ELSE 4 END AS INTEGER) AS n_frames
        | FROM documents""".stripMargin)((s, dir) => {
      import s.implicits._
      implicit val sp: org.apache.spark.sql.SparkSession = s
      val media = table(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[Multimodal.MediaRow]
      Multimodal.decodeBatch(media, frames = 4)
        .select(col("doc_id"), col("meta.format").as("format"),
          col("meta.bytes").as("bytes"), size(col("frames")).as("n_frames"))
    })
  )
}
