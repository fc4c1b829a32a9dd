package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata. The container has no image/audio codecs, so
  * the "decode" is a deterministic structural stub (byte length, content
  * md5, frame count at a fixed 256-byte fake frame size) — but the
  * Spark-side shape is real: binary columns, per-row metadata extraction in
  * codegen, and (in `graft.multimodal`) partition-batched feature
  * extraction via `mapPartitions`.
  *
  * The binary payload here is the utf-8 encoding of `documents.text`
  * (DuckDB's md5/octet_length over the same utf-8 bytes agree exactly).
  */
object MultimodalQueries {

  val entries: Seq[Entry] = Seq(

    entry("q_mm_meta",
      """SELECT doc_id, octet_length(encode(text)) AS byte_len, md5(text) AS content_md5,
        |  CAST(ceil(octet_length(encode(text))/256.0) AS BIGINT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .select(col("doc_id"),
          length(col("payload")).as("byte_len"),
          md5(col("payload")).as("content_md5"),
          ceil(length(col("payload")) / lit(256.0)).cast("long").as("n_frames"))
        .orderBy(col("doc_id"))
    }
  )
}
