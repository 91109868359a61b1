package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFns, VecFns}

/** Deduplication family for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.
  *
  * Scale notes (the whole point of the LSH/banding structure):
  *  - candidate generation is a self-equi-join on (band_idx, band_hash) —
  *    a hash shuffle on the band key, never an O(n²) cross join;
  *  - per-band buckets are the only quadratic term; band width / row
  *    count tune bucket sizes, and a pathological hot bucket (all-equal
  *    docs) is exactly the duplicate cluster we're hunting anyway;
  *  - everything downstream (exact Jaccard, cosine) runs only on
  *    candidate pairs.
  */
object Dedup {

  /** Keep the first row per key in `order`-order (row_number()=1). */
  def exactFirst(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** doc_id -> exploded (band_idx, band_hash) LSH keys. */
  def lshKeys(df: DataFrame, idCol: Column, textCol: Column,
              shingleN: Int, k: Int, bands: Int): DataFrame = {
    val rows = k / bands
    val sig = TextFns.minhashSignature(
      TextFns.shingles(TextFns.tokens(textCol), shingleN), k)
    df.select(idCol.as("doc_id"),
        explode(TextFns.lshBands(sig, bands, rows)).as("band"))
      .select(col("doc_id"), col("band.band_idx"), col("band.band_hash"))
  }

  /** Candidate near-duplicate pairs via MinHash LSH banding: pairs of
    * ids sharing >= 1 band. Output: (doc_a, doc_b, n_shared_bands),
    * doc_a < doc_b.
    */
  def minhashCandidates(df: DataFrame, idCol: Column, textCol: Column,
                        shingleN: Int = 3, k: Int = 16, bands: Int = 4): DataFrame = {
    val keys = lshKeys(df, idCol, textCol, shingleN, k, bands)
    val a = keys.toDF("doc_a", "band_idx", "band_hash")
    val b = keys.toDF("doc_b", "band_idx", "band_hash")
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** LSH candidates refined with exact shingle-set Jaccard >= minSim. */
  def jaccardPairs(df: DataFrame, idCol: Column, textCol: Column,
                   shingleN: Int = 3, k: Int = 16, bands: Int = 4,
                   minSim: Double = 0.3): DataFrame = {
    val sh = df.select(idCol.as("id"),
      TextFns.shingles(TextFns.tokens(textCol), shingleN).as("sh"))
    val cand = minhashCandidates(df, idCol, textCol, shingleN, k, bands)
    cand
      .join(sh.toDF("doc_a", "sh_a"), "doc_a")
      .join(sh.toDF("doc_b", "sh_b"), "doc_b")
      .withColumn("jaccard", round(TextFns.jaccardSim(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= minSim)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Per-document SimHash fingerprint (bitstring). Documents sharing the
    * fingerprint are near-identical; grouping by it is the cheap
    * near-dup clustering.
    */
  def simhash(df: DataFrame, idCol: Column, textCol: Column, bits: Int = 32): DataFrame =
    df.select(idCol.as("doc_id"),
      TextFns.simhashBits(TextFns.tokens(textCol), bits).as("simhash"))

  /** Embedding near-dup: pairs within the same blocking cell whose
    * cosine exceeds `minCos`. Blocking (here: a caller-supplied cell
    * column, e.g. an IVF/LSH bucket or a label) keeps the join from
    * going quadratic at scale.
    */
  def embeddingPairs(df: DataFrame, idCol: Column, vecCol: Column,
                     cellCol: Column, minCos: Double): DataFrame = {
    val e = df.select(idCol.as("id"), vecCol.as("v"), cellCol.as("cell"))
    val a = e.toDF("id_a", "v_a", "cell")
    val b = e.toDF("id_b", "v_b", "cell")
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(VecFns.cosine(col("v_a"), col("v_b")), 6))
      .filter(col("cos") > minCos)
      .select(col("cell"), col("id_a"), col("id_b"), col("cos"))
  }
}
