package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted incremental-dedup index — the production form of the d09
  * contract (reference scope: lakeflush has no dedup at all; this is
  * the §2.11 training-pipeline extension).
  *
  * A 100 TB pipeline never re-shingles the lake per crawl: it keeps
  * three derived tables on disk and dedups each day's delta against
  * them —
  *
  *   - `hashes`   (base_id, _h)                 — md5(text), exact flags
  *   - `bands`    (base_id, band_idx, band_hash) — LSH probe keys
  *   - `shingles` (base_id, sh)                 — sorted-distinct
  *     shingle sets, Jaccard refinement for LSH candidates only
  *
  * plus a one-row `meta` table pinning the construction parameters
  * (shingle n, signature width k, band count). [[Dedup.incrementalFlagsIndexed]]
  * takes its parameters FROM the index, so a delta can never be
  * shingled with a different recipe than the corpus it probes.
  *
  * Scale notes: all three tables are linear in the corpus and carry
  * fixed-width keys or shingle arrays, never raw document text. The
  * candidate join is delta-bands × index-bands — at cluster scale,
  * persist `bands` bucketed on (band_idx, band_hash)
  * (`.bucketBy(n, ...)` into a metastore-backed table) and the probe
  * shuffles ONLY the delta side; the plain-parquet layout here keeps
  * the sandbox path self-contained. After flagging, [[appendNovel]]
  * folds the novel slice into the index (parquet append — each table
  * is keyed by base_id, so appends never rewrite history), which is
  * what keeps tomorrow's run incremental too.
  */
object DedupIndex {

  private val FormatVersion = 1

  /** Construction parameters, persisted with the index. */
  final case class Meta(shingleN: Int, k: Int, bands: Int)

  /** A loaded (or freshly derived) index: three frames + parameters. */
  final case class Index(hashes: DataFrame, bands: DataFrame,
                         shingles: DataFrame, meta: Meta)

  /** Derive the three index tables from a corpus slice (no I/O). */
  def frames(base: DataFrame, idCol: Column, textCol: Column, meta: Meta): Index = {
    val hashes = base.select(idCol.as("base_id"), md5(textCol).as("_h"))
    val sh = Dedup.shingleTable(base, idCol, textCol, meta.shingleN)
    val bandKeys = Dedup.lshKeysFromShingles(sh, meta.k, meta.bands)
      .toDF("base_id", "band_idx", "band_hash")
    Index(hashes, bandKeys, sh.toDF("base_id", "sh"), meta)
  }

  /** Build and persist an index over `base` at `path`. */
  def write(path: String, base: DataFrame, idCol: Column, textCol: Column,
            shingleN: Int = 3, k: Int = 16, bands: Int = 4): Unit = {
    val ix = frames(base, idCol, textCol, Meta(shingleN, k, bands))
    ix.hashes.write.mode("overwrite").parquet(s"$path/hashes")
    ix.bands.write.mode("overwrite").parquet(s"$path/bands")
    ix.shingles.write.mode("overwrite").parquet(s"$path/shingles")
    writeMeta(base.sparkSession, path, ix.meta)
  }

  def load(spark: SparkSession, path: String): Index =
    Index(
      spark.read.parquet(s"$path/hashes"),
      spark.read.parquet(s"$path/bands"),
      spark.read.parquet(s"$path/shingles"),
      readMeta(spark.read.parquet(s"$path/meta"), path))

  /** Cluster-scale layout: the same three tables persisted as BUCKETED
    * metastore tables, each bucketed+sorted on its probe-join key —
    * `bands` on (band_idx, band_hash), `hashes` on `_h`, `shingles` on
    * `base_id`. The write pays each table's shuffle ONCE; every later
    * delta probe then plans its base-side joins with NO Exchange on the
    * index side (only the day's delta shuffles — DedupIndexSpec asserts
    * the exchange count drops vs the plain-parquet layout and that the
    * scans are bucketed). At 100 TB the index is the big side by far,
    * so this turns the daily probe from a corpus-sized shuffle into a
    * delta-sized one. Size `buckets` so one bucket of `bands` fits an
    * executor sort buffer (same rule as [[Bucketing]]).
    */
  def writeBucketed(base: DataFrame, idCol: Column, textCol: Column,
                    prefix: String, buckets: Int,
                    shingleN: Int = 3, k: Int = 16, bands: Int = 4): Unit = {
    val ix = frames(base, idCol, textCol, Meta(shingleN, k, bands))
    def save(df: DataFrame, name: String, keys: Seq[String]): Unit =
      df.write.format("parquet").mode("overwrite")
        .bucketBy(buckets, keys.head, keys.tail: _*)
        .sortBy(keys.head, keys.tail: _*)
        .saveAsTable(s"${prefix}_$name")
    save(ix.bands, "bands", Seq("band_idx", "band_hash"))
    save(ix.hashes, "hashes", Seq("_h"))
    save(ix.shingles, "shingles", Seq("base_id"))
    import base.sparkSession.implicits._
    Seq((FormatVersion, ix.meta.shingleN, ix.meta.k, ix.meta.bands))
      .toDF("version", "shingle_n", "k", "bands")
      .coalesce(1).write.mode("overwrite").saveAsTable(s"${prefix}_meta")
  }

  def loadBucketed(spark: SparkSession, prefix: String): Index =
    Index(
      spark.table(s"${prefix}_hashes"),
      spark.table(s"${prefix}_bands"),
      spark.table(s"${prefix}_shingles"),
      readMeta(spark.table(s"${prefix}_meta"), prefix))

  private def readMeta(metaDf: DataFrame, where: String): Meta = {
    val m = metaDf.collect()
    require(m.length == 1, s"dedup index at $where: meta must be one row, got ${m.length}")
    val v = m(0).getAs[Int]("version")
    require(v == FormatVersion,
      s"dedup index at $where: format version $v, expected $FormatVersion")
    Meta(m(0).getAs[Int]("shingle_n"), m(0).getAs[Int]("k"),
      m(0).getAs[Int]("bands"))
  }

  /** Fold the NOVEL slice of a flagged delta into the index: documents
    * with no entry in `flags` (the [[Dedup.incrementalFlagsIndexed]]
    * result for this delta) are new corpus content and must be probe-able
    * by the next delta. Flagged duplicates are NOT appended — the index
    * keeps one representative per content, so its growth tracks novel
    * content, not crawl volume.
    */
  def appendNovel(path: String, delta: DataFrame, idCol: Column,
                  textCol: Column, flags: DataFrame): Unit = {
    val spark = delta.sparkSession
    val meta = load(spark, path).meta
    // rename the flag key: the delta's own id column is usually also
    // named doc_id, and a same-name join condition is ambiguous
    val flagged = flags.select(col("doc_id").as("_flagged_id")).distinct()
    val novel = delta.join(flagged, idCol === col("_flagged_id"), "left_anti")
    val ix = frames(novel, idCol, textCol, meta)
    ix.hashes.write.mode("append").parquet(s"$path/hashes")
    ix.bands.write.mode("append").parquet(s"$path/bands")
    ix.shingles.write.mode("append").parquet(s"$path/shingles")
  }

  private[operators] def writeMeta(spark: SparkSession, path: String, meta: Meta): Unit = {
    import spark.implicits._
    Seq((FormatVersion, meta.shingleN, meta.k, meta.bands))
      .toDF("version", "shingle_n", "k", "bands")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }
}
