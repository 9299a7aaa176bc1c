package graft.queries

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal-column EXT queries: the documents' text bytes stand in
  * for opaque media payloads (the codec itself is stubbed — see
  * [[graft.multimodal.Multimodal]]); byte-level metadata, content
  * addressing, and frame-sampling arithmetic are real and
  * oracle-checked.
  */
object MmQueries {

  val defs: Map[String, Q] = Map(
    "mm_meta" -> { (s, dir) =>
      val payload = Multimodal.asPayload(col("text"))
      table(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.byteLen(payload).as("byte_len"),
          Multimodal.contentKey(payload).as("content_key"),
          (lit(64) + pmod(col("doc_id"), lit(64L)).cast("int")).as("width"),
          (lit(64) + pmod(col("doc_id") * 7, lit(64L)).cast("int")).as("height"),
          Multimodal.sampledFrameCount(col("n_chars"), 100).as("n_frames"))
        .orderBy(col("doc_id"))
    }
  )

  val oracles: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS byte_len,
        |  md5(text) AS content_key,
        |  CAST(64 + doc_id % 64 AS INT) AS width,
        |  CAST(64 + (doc_id * 7) % 64 AS INT) AS height,
        |  CAST(greatest(1, n_chars // 100) AS INT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
