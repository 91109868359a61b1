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
             |FROM documents""".stripMargin))
  )
}
