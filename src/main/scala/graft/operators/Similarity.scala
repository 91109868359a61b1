package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VecFns

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query
  * set against the corpus, so the corpus is scanned once with no
  * shuffle until the final per-query top-k (rank-filter window on the
  * query key, never a global sort).
  *
  * Scale path: cell-partitioned search (IVF-style): corpus and queries
  * carry a cell id (coarse quantizer / LSH bucket); the join is
  * equi on the cell, cutting candidates by the cell fan-out. With a
  * trained quantizer you'd probe the nearest `nprobe` cells — the
  * plumbing is identical (explode query->probe cells, equi-join).
  */
object Similarity {

  /** Brute-force exact top-k neighbors for each query row.
    * `queries`/`corpus`: (id, vec). Self-matches excluded.
    */
  def knnBruteForce(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val par = corpus.sparkSession.sessionState.conf.numShufflePartitions
    val q = queries.toDF("query_id", "q_vec")
    // corpus often arrives as one small split; spread the per-row cosine
    val c = corpus.toDF("vec_id", "c_vec").repartition(par)
    val scored = c.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .withColumn("cos", round(VecFns.cosine(col("q_vec"), col("c_vec")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk").cast("long").as("rk"), col("vec_id"), col("cos"))
  }

  /** Sign-LSH ANN: bucket both sides with deterministic random-
    * hyperplane signs ([[graft.expressions.HyperplaneBucket]]), then
    * search within the bucket. `multiProbe` additionally probes every
    * bucket at Hamming distance 1 (flip one plane's sign) — the
    * standard recall/cost dial; candidates stay
    * |corpus|/2^planes x (1+planes) per query instead of |corpus|.
    */
  def knnHyperplaneLSH(queries: DataFrame, corpus: DataFrame, k: Int,
                       nPlanes: Int = 4, dim: Int = 64,
                       multiProbe: Boolean = true): DataFrame = {
    import graft.expressions.NativeFns.hyperplane_bucket
    val c = corpus.toDF("vec_id", "c_vec")
      .withColumn("cell", hyperplane_bucket(col("c_vec"), nPlanes, dim))
    val probes: Column = {
      val base = hyperplane_bucket(col("q_vec"), nPlanes, dim)
      if (!multiProbe) array(base)
      else array((base +: (0 until nPlanes).map(p => base.bitwiseXOR(lit(1 << p)))): _*)
    }
    val q = queries.toDF("query_id", "q_vec")
      .withColumn("cell", explode(probes))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", round(VecFns.cosine(col("q_vec"), col("c_vec")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk").cast("long").as("rk"), col("vec_id"), col("cos"))
  }

  /** Cell-partitioned (IVF-style) top-k: only corpus rows sharing the
    * query's cell are scored. `queries`/`corpus`: (id, vec, cell).
    */
  def knnByCell(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.toDF("query_id", "q_vec", "cell")
    val c = corpus.toDF("vec_id", "c_vec", "cell")
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", round(VecFns.cosine(col("q_vec"), col("c_vec")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("cell"), col("rk").cast("long").as("rk"), col("vec_id"), col("cos"))
  }
}
