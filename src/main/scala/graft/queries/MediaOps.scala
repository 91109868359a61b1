package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Multimodal

/** Multimodal binary-column surface (oracle-checkable slice): the
  * expression-only metadata pass over a binary payload column. The
  * decode/frame-sample paths (mapPartitions + stub codec) are exercised
  * by ScalaTest — not SQL-expressible.
  */
object MediaOps extends QuerySet {

  val all: Seq[Q] = Seq(

    // documents.text cast to binary stands in for an opaque media
    // payload: byte length, md5 checksum, 4-byte magic prefix.
    Q("m01_binary_stats",
      (s, d) => {
        import s.implicits._
        Multimodal.binaryStats(
          Tables.load(s, d, "documents")
            .withColumn("payload", $"text".cast("binary")),
          "doc_id", "payload")
      },
      Some("""SELECT doc_id,
             |CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
             |md5(text) AS checksum,
             |upper(substr(hex(encode(text)), 1, 8)) AS magic
             |FROM documents""".stripMargin)),

    // Frame sampling through the REAL decoder plumbing (Dataset +
    // mapPartitions executor-side fan-out, one stub-decoder per task):
    // up to 4 evenly spaced 64-byte "frames" per payload. The oracle
    // re-states the sampling arithmetic (n = min(4, max(1, len/64)),
    // offset_i = len*i/n) over the hex encoding, since DuckDB cannot
    // slice blobs directly.
    Q("m02_frame_sample",
      (s, d) => {
        import s.implicits._
        val media = Tables.load(s, d, "documents")
          .select($"doc_id".as("media_id"), lit("text").as("kind"),
            $"text".cast("binary").as("payload"))
          .as[Multimodal.MediaRow]
        Multimodal.sampleFrames(media, k = 4, frameBytes = 64)
          .select($"media_id".as("doc_id"),
            $"frame_idx".cast("long").as("frame_idx"),
            upper(hex($"frame_bytes")).as("frame_hex"))
      },
      Some("""WITH p AS (SELECT doc_id, encode(text) AS b FROM documents),
             |q AS (SELECT doc_id, b, octet_length(b) AS L,
             |  least(4, greatest(1, octet_length(b) // 64)) AS nf FROM p),
             |f AS (SELECT doc_id, b, L, nf,
             |  unnest(range(0, nf)) AS frame_idx FROM q)
             |SELECT doc_id, frame_idx,
             |  upper(substr(hex(b),
             |    CAST((L * frame_idx) // nf AS BIGINT) * 2 + 1, 128)) AS frame_hex
             |FROM f""".stripMargin))
  )
}
