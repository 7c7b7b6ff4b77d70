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
    // batch shape) — not SQL-expressible, driver records rows-only
    Q("mm_frame_sample", (s, dir) => {
      import s.implicits._
      implicit val sp: org.apache.spark.sql.SparkSession = s
      val media = table(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[Multimodal.MediaRow]
      Multimodal.decodeBatch(media, frames = 4)
        .select(col("doc_id"), col("meta.format").as("format"),
          col("meta.bytes").as("bytes"), size(col("frames")).as("n_frames"))
    }, None)
  )
}
