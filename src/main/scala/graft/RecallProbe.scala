package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** ANN quality probe: measured recall@k for the approximate search
  * paths against the exact brute-force ground truth — "measure, don't
  * guess" applied to the approximation itself, not just its wall.
  *
  * The s-family correctness oracles pin each variant's EXACT semantics
  * (every approximate path is deterministic, so DuckDB can replay it);
  * what they deliberately do not measure is how good the approximation
  * IS — the recall/cost dial a user actually turns (nprobe for IVF,
  * multi-probe for sign-LSH). This probe quantifies that dial on the
  * organic sf0.1 embeddings (NOT the 100x-replicated sf10 corpus,
  * whose exact duplicate clusters would hand every variant free
  * recall): per variant, mean recall@10 over the query set plus the
  * scored-candidate fraction — the fraction of the corpus each query
  * actually paid to score, which is the cost side of the dial.
  *
  * Usage: runMain graft.RecallProbe [sfDir] [nQueries] [k].
  * Writes BENCH_ann_recall.json; last stdout line is the JSON.
  */
object RecallProbe {

  private def f4(d: Double) = math.round(d * 10000.0) / 10000.0

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nQ = if (args.length > 1) args(1).toInt else 100
    val k = if (args.length > 2) args(2).toInt else 10

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ann-recall-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val corpusN = e.count()
    val queries = e.filter(col("vec_id") < nQ)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // ground truth: exact cosine top-k per query (the s01 operator)
    def ids(df: DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet }
    val (truth, truthSec) = timed(
      ids(Similarity.knnBruteForce(queries, e, k)))

    // candidate fraction: rows scored per query / corpus size, the cost
    // the variant pays. Computed from the same candidate join the
    // search runs (cell-equi or probe-cell-equi), counted not ranked.
    def recallRow(name: String, df: => DataFrame,
                  candPerQuery: => Double): String = {
      val (got, sec) = timed(ids(df))
      val recalls = truth.map { case (q, t) =>
        got.get(q).map(g => (g & t).size.toDouble / t.size).getOrElse(0.0) }
      val mean = recalls.sum / recalls.size
      val worst = recalls.foldLeft(1.0)(math.min)
      val frac = candPerQuery / corpusN
      println(f"[recall] $name%-22s recall@$k mean $mean%.4f worst $worst%.4f " +
        f"cand-frac $frac%.4f wall $sec%.2fs")
      s"""{"variant":"$name","recall_mean":${f4(mean)},""" +
      s""""recall_worst":${f4(worst)},"cand_frac":${f4(frac)},""" +
      s""""wall_sec":${f4(sec)}}"""
    }

    import graft.expressions.NativeFns.{hyperplane_bucket, nearest_centroid}
    def lshCand(nPlanes: Int, multiProbe: Boolean): Double = {
      val c = e.withColumn("cell", hyperplane_bucket(col("embedding"), nPlanes, 64))
      val base = hyperplane_bucket(col("embedding"), nPlanes, 64)
      val probes =
        if (!multiProbe) array(base)
        else array((base +: (0 until nPlanes).map(p => base.bitwiseXOR(lit(1 << p)))): _*)
      val q = queries.withColumn("cell", explode(probes))
        .select(col("vec_id").as("query_id"), col("cell"))
      c.join(q, Seq("cell")).count().toDouble / nQ
    }
    def ivfCand(nCells: Int, nprobe: Int): Double = {
      val cents = Similarity.trainIvfCentroids(e, nCells, iters = 2, dim = 64)
      val c = e.withColumn("cell", nearest_centroid(col("embedding"), cents))
      val cellSizes = c.groupBy("cell").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val centDf = spark.createDataFrame(
        cents.zipWithIndex.map { case (v, i) => (i, v) }.toSeq).toDF("cell", "cent")
      queries.crossJoin(broadcast(centDf))
        .withColumn("score", graft.functions.VecFns.cosine(col("embedding"),
          transform(col("cent"), x => x.cast("float"))))
        .withColumn("pr", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
            .orderBy(col("score").desc, col("cell").asc)))
        .filter(col("pr") <= nprobe)
        .select("cell").collect()
        .map(r => cellSizes.getOrElse(r.getInt(0), 0L)).sum.toDouble / nQ
    }

    val variants = Seq(
      recallRow("lsh_p4_single",
        Similarity.knnHyperplaneLSH(queries, e, k, nPlanes = 4, multiProbe = false),
        lshCand(4, multiProbe = false)),
      recallRow("lsh_p4_multiprobe",
        Similarity.knnHyperplaneLSH(queries, e, k, nPlanes = 4, multiProbe = true),
        lshCand(4, multiProbe = true)),
      recallRow("ivf_c16_np1",
        Similarity.knnIvf(queries, e, k, nCells = 16, nprobe = 1),
        ivfCand(16, 1)),
      recallRow("ivf_c16_np2",
        Similarity.knnIvf(queries, e, k, nCells = 16, nprobe = 2),
        ivfCand(16, 2)),
      recallRow("ivf_c16_np4",
        Similarity.knnIvf(queries, e, k, nCells = 16, nprobe = 4),
        ivfCand(16, 4)))

    val json =
      s"""{"metric":"ann_recall","corpus_rows":$corpusN,"queries":$nQ,""" +
      s""""k":$k,"truth_wall_sec":${f4(truthSec)},""" +
      s""""variants":${variants.mkString("[", ",", "]")}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_ann_recall.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
