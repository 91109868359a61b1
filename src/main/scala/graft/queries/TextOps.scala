package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for the training-data pipeline (builder
  * contract §north-star): token counting, quality scoring, language ID,
  * fingerprinting — all whole-stage-codegen expressions over the
  * `documents` table, no UDFs.
  */
object TextOps extends QuerySet {

  val all: Seq[Q] = Seq(

    // --- Token & char counting (whitespace tokenizer). Regex kept to the
    // POSIX-compatible subset so Java regex (Spark) and RE2 (DuckDB)
    // agree.
    Q("t01_token_count",
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "documents")
          .select(
            $"doc_id",
            size(split(trim($"text"), "\\s+")).cast("long").as("n_tok"),
            length($"text").cast("long").as("n_char"),
            round(length($"text") / size(split(trim($"text"), "\\s+")).cast("double"), 4)
              .as("chars_per_tok"))
      },
      Some("""SELECT doc_id,
             |CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok,
             |CAST(length(text) AS BIGINT) AS n_char,
             |round(length(text) / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE), 4) AS chars_per_tok
             |FROM documents""".stripMargin))
  )
}
