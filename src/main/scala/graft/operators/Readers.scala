package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Format-aware lake ingestion (reference S3/S4/W4 semantics,
  * Spark-first).
  *
  * Reference behaviors and their Spark re-expression:
  *  - JSON whole-file records (`utils/file/reader/json.py:8-12`: one
  *    file -> one opaque text record, empty files skipped) ->
  *    `wholetext` text source + length filter; or schema'd `json` for
  *    the analytic path.
  *  - CSV header capture/dedup (`utils/file/reader/csv.py:14-21`: first
  *    file's header kept, later files' headers dropped) -> Spark's csv
  *    source does per-file header skipping natively (`header=true`),
  *    and a written bundle re-emits the header per output file —
  *    reference W4's "self-describing bundle" for free.
  *  - Glob filter F1 -> `pathGlobFilter` (pushed into file listing, so
  *    pruned files are never opened).
  *  - mtime order S1 -> `_metadata.file_modification_time` sort.
  *
  * The batched-100-lines + 1 ms sleep throttling of the reference CSV
  * reader is a single-process pacing concern with no cluster
  * equivalent — cluster scheduling replaces cooperative sleep (SURVEY
  * §2.1 S4); deliberately not replicated.
  */
object Readers {

  /** Whole-file text records in (mtime, path) order with per-file
    * lineage columns — the compaction-path record stream.
    *
    * `tolerant=true` maps the reference's per-file error isolation (O1:
    * warn-and-continue on unreadable files, `collectors/local_lake.py:
    * 60-82`) to `ignoreCorruptFiles`/`ignoreMissingFiles` — a bad file
    * skips, the scan survives.
    */
  def wholeTextRecords(spark: SparkSession, root: String,
                       glob: Option[String] = None,
                       tolerant: Boolean = false): DataFrame = {
    val base = spark.read.option("wholetext", "true")
      .option("ignoreCorruptFiles", tolerant.toString)
      .option("ignoreMissingFiles", tolerant.toString)
    glob.fold(base)(g => base.option("pathGlobFilter", g)).text(root)
      .select(
        col("_metadata.file_path").as("path"),
        col("_metadata.file_modification_time").as("mtime"),
        col("_metadata.file_size").as("size"),
        col("value").as("content"))
      .filter(length(col("content")) > 0)
  }

  /** Schema'd CSV lake read with native per-file header dedup. */
  def csvLake(spark: SparkSession, root: String, schema: Option[StructType] = None,
              glob: Option[String] = None): DataFrame = {
    val base = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE") // reference O1: per-file error isolation
    val withSchema = schema.fold(base.option("inferSchema", "true"))(base.schema)
    glob.fold(withSchema)(g => withSchema.option("pathGlobFilter", g))
      .csv(root)
  }

  /** Schema'd JSON-lines / multiline JSON lake read. */
  def jsonLake(spark: SparkSession, root: String, schema: Option[StructType] = None,
               multiLine: Boolean = true, glob: Option[String] = None): DataFrame = {
    val base = spark.read.option("multiLine", multiLine.toString)
    val withSchema = schema.fold(base)(base.schema)
    glob.fold(withSchema)(g => withSchema.option("pathGlobFilter", g)).json(root)
  }

  /** Columnar ORC lake read (beyond-reference source breadth: the
    * reference reads JSON/CSV only). Self-describing like parquet, with
    * predicate pushdown and column pruning through the native reader.
    */
  def orcLake(spark: SparkSession, root: String, schema: Option[StructType] = None,
              glob: Option[String] = None): DataFrame = {
    val base = spark.read
    val withSchema = schema.fold(base)(base.schema)
    glob.fold(withSchema)(g => withSchema.option("pathGlobFilter", g)).orc(root)
  }
}
