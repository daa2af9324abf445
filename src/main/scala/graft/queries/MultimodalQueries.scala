package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Multimodal column queries: binary media containers synthesized from
  * document text (this container has no media codecs — see
  * ops.Multimodal for the stub boundary), with metadata extraction and
  * frame-sample planning as oracle-checked column expressions. */
object MultimodalQueries {

  def defs: Seq[Q] = Seq(
    Q(
      "m1_media_meta",
      (s, dir) => {
        val docs = Registry.table(s, dir, "documents")
        val frames = (col("n_chars") % 50 + 1).cast("int")
        val media = Multimodal.packMedia(col("text"), col("doc_id") % 3, frames)
        docs
          .select(col("doc_id"), media.as("media"), frames.as("frames"))
          .select(
            col("doc_id"),
            length(col("media")).cast("long").as("n_bytes"),
            (length(col("media")) - Multimodal.HeaderLen).cast("long").as("payload_len"),
            when(col("doc_id") % 3 === 0, "img")
              .when(col("doc_id") % 3 === 1, "audio")
              .otherwise("video").as("format"),
            size(Multimodal.sampleFrameIndexes(col("frames"), every = 3, cap = 5))
              .cast("long").as("n_sample_frames"))
          .orderBy("doc_id")
      },
      Some(s"""
        SELECT doc_id,
               octet_length(encode('GRFT' || (doc_id % 3)
                 || lpad(CAST(n_chars % 50 + 1 AS VARCHAR), 4, '0') || ':' || text))::BIGINT AS n_bytes,
               (octet_length(encode(text)))::BIGINT AS payload_len,
               CASE doc_id % 3 WHEN 0 THEN 'img' WHEN 1 THEN 'audio' ELSE 'video' END AS format,
               least((n_chars % 50 + 1 + 2) // 3, 5)::BIGINT AS n_sample_frames
        FROM documents
        ORDER BY doc_id
      """.trim),
    ),
  )
}
