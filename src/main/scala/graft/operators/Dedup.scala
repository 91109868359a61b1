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

  /** (doc_id, shingles) table, redistributed for compute parallelism.
    *
    * The repartition matters: a "small" documents table often arrives as
    * ONE parquet split (file size < maxPartitionBytes), which would run
    * the entire hash-heavy signature computation single-threaded — the
    * input's file layout must not dictate the compute stage's
    * parallelism. The table is persisted because candidate generation
    * (self-join) and Jaccard refinement both consume it; without
    * persistence each consumer re-tokenizes and re-shingles the corpus.
    * At cluster scale, persist to an intermediate parquet instead and
    * drop the round-robin shuffle once inputs arrive in many splits.
    */
  def shingleTable(df: DataFrame, idCol: Column, textCol: Column,
                   shingleN: Int): DataFrame = {
    val par = df.sparkSession.sessionState.conf.numShufflePartitions
    Caches.track(
      df.select(idCol.as("doc_id"), textCol.as("_text"))
        .repartition(par)
        .select(col("doc_id"),
          graft.expressions.NativeFns.word_shingles(col("_text"), shingleN).as("sh")))
  }

  /** (doc_id, band_idx, band_hash) LSH keys from a shingle table. */
  def lshKeysFromShingles(sh: DataFrame, k: Int, bands: Int): DataFrame = {
    val rows = k / bands
    val sig = TextFns.minhashSignature(col("sh"), k)
    sh.select(col("doc_id"), explode(TextFns.lshBands(sig, bands, rows)).as("band"))
      .select(col("doc_id"), col("band.band_idx"), col("band.band_hash"))
  }

  /** Candidate pairs (doc_a < doc_b, n_shared_bands) from a shingle
    * table: equi-join on the band key — linear shuffle, no cross
    * product.
    */
  def candidatesFromShingles(sh: DataFrame, k: Int, bands: Int): DataFrame = {
    // persist the band keys: the self-join consumes them twice, and
    // without the cache each side recomputes the full minhash pass.
    // Registered with Caches so long-lived sessions can release.
    val keys = Caches.track(lshKeysFromShingles(sh, k, bands))
    val a = keys.toDF("doc_a", "band_idx", "band_hash")
    val b = keys.toDF("doc_b", "band_idx", "band_hash")
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** Candidate near-duplicate pairs via MinHash LSH banding. */
  def minhashCandidates(df: DataFrame, idCol: Column, textCol: Column,
                        shingleN: Int = 3, k: Int = 16, bands: Int = 4): DataFrame =
    candidatesFromShingles(shingleTable(df, idCol, textCol, shingleN), k, bands)

  /** LSH candidates refined with exact shingle-set Jaccard >= minSim.
    * Tokenization/shingling happens ONCE (shared shingle table feeds
    * both the signature and the refinement join).
    */
  def jaccardPairs(df: DataFrame, idCol: Column, textCol: Column,
                   shingleN: Int = 3, k: Int = 16, bands: Int = 4,
                   minSim: Double = 0.3): DataFrame = {
    val sh = shingleTable(df, idCol, textCol, shingleN)
    val cand = candidatesFromShingles(sh, k, bands)
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

  /** Cluster formation over a near-dup pair graph — the step that turns
    * verified pairs into one-representative-per-group: connected
    * components by min-label propagation, where each vertex's label
    * converges to the minimum doc id in its component (the canonical
    * representative "keep" doc; everything else is the drop-set).
    *
    * Scale shape: per round ONE equi-join (edges x labels) + ONE
    * aggregation; rounds ≈ component diameter (near-dup clusters are
    * shallow — a handful of rounds). Label/edge frames are
    * localCheckpointed so lineage doesn't grow with rounds. This is the
    * standard large-graph CC recipe (label propagation, cf. the
    * small-star/large-star refinement for adversarial diameters).
    * Returns (doc_id, cluster_rep) for every vertex in the pair graph.
    */
  def clusters(pairs: DataFrame, aCol: Column, bCol: Column,
               maxRounds: Int = 50): DataFrame = {
    val edges = pairs.select(aCol.as("src"), bCol.as("dst"))
      .union(pairs.select(bCol.as("src"), aCol.as("dst")))
      .distinct().localCheckpoint()
    var labels = edges.select(col("src").as("v")).distinct()
      .withColumn("label", col("v")).localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < maxRounds) {
      val neighborMin = edges
        .join(labels.select(col("v").as("dst"), col("label")), "dst")
        .groupBy(col("src")).agg(min(col("label")).as("nmin"))
      // carry the previous label through the checkpoint: the
      // convergence check is then a filter-count over materialized
      // blocks, not a per-round join against the old frame
      val staged = labels.select(col("v"), col("label").as("_old"))
        .join(neighborMin.select(col("src").as("v"), col("nmin")), Seq("v"), "left")
        .select(col("v"), least(col("_old"),
          coalesce(col("nmin"), col("_old"))).as("label"), col("_old"))
        .localCheckpoint()
      changed = staged.filter(col("label") =!= col("_old")).count()
      labels = staged.drop("_old")
      rounds += 1
    }
    labels.select(col("v").as("doc_id"), col("label").as("cluster_rep"))
  }

  /** Embedding near-dup: pairs within the same blocking cell whose
    * cosine exceeds `minCos`. Blocking (here: a caller-supplied cell
    * column, e.g. an IVF/LSH bucket or a label) keeps the join from
    * going quadratic at scale.
    */
  def embeddingPairs(df: DataFrame, idCol: Column, vecCol: Column,
                     cellCol: Column, minCos: Double): DataFrame = {
    val par = df.sparkSession.sessionState.conf.numShufflePartitions
    val e = df.select(idCol.as("id"), vecCol.as("v"), cellCol.as("cell"))
    val a = e.toDF("id_a", "v_a", "cell")
    val b = e.toDF("id_b", "v_b", "cell")
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      // redistribute the pair table before the compute-bound cosine:
      // with fewer cells than cores the cell-join's output partitioning
      // would cap parallelism at |cells|
      .repartition(par)
      .withColumn("cos", round(VecFns.cosine(col("v_a"), col("v_b")), 6))
      .filter(col("cos") > minCos)
      .select(col("cell"), col("id_a"), col("id_b"), col("cos"))
  }
}
