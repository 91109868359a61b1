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
  * multi-probe for sign-LSH, and — new this round — the seeding mode
  * of the coarse quantizer). Two corpora, because they bracket the
  * user's reality:
  *
  *   - ORGANIC: the sf embeddings fixture — near-uniform synthetic
  *     vectors, ANN's documented adversarial floor (no cluster
  *     structure to exploit, so candidate fraction buys recall almost
  *     linearly).
  *   - CLUSTERED: a deterministic 32-blob corpus (seeded RNG — same
  *     bytes every run) with noise comparable to real embedding
  *     manifolds. This is the favorable case users actually have:
  *     text/image embeddings cluster, and IVF's whole bet is that
  *     cells align with that structure.
  *
  * Per variant: mean/worst recall@10 over the query set plus the
  * scored-candidate fraction — the fraction of the corpus each query
  * actually paid to score, which is the cost side of the dial.
  *
  * Usage: runMain graft.RecallProbe [sfDir] [nQueries] [k].
  * Writes BENCH_ann_recall.json; last stdout line is the JSON.
  */
object RecallProbe {

  private def f4(d: Double) = math.round(d * 10000.0) / 10000.0

  /** Deterministic clustered corpus: `nClusters` gaussian centers,
    * each point = center + sigma * noise (per-dim), floats. Seeded
    * generator — byte-identical across runs.
    */
  def clusteredCorpus(spark: SparkSession, n: Int, dim: Int,
                      nClusters: Int, sigma: Double,
                      seed: Long): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(nClusters, dim)(rnd.nextGaussian())
    val rows = (0 until n).map { i =>
      val c = centers(i % nClusters)
      val v = Array.tabulate(dim)(j => (c(j) + sigma * rnd.nextGaussian()).toFloat)
      (i.toLong, v.toSeq)
    }
    spark.createDataFrame(rows).toDF("vec_id", "embedding")
  }

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
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def ids(df: DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet }

    import graft.expressions.NativeFns.{hyperplane_bucket, nearest_centroid}

    /** One corpus section: ground truth + a list of named variants. */
    def section(label: String, e: DataFrame, queries: DataFrame): Seq[String] = {
      val corpusN = e.count()
      // ADVICE r11: denominator is the MEASURED query count, not the
      // requested nQ — sparse/offset vec_ids would misscale the frac
      val qN = queries.count()
      val (truth, truthSec) = timed(ids(Similarity.knnBruteForce(queries, e, k)))
      println(f"[recall] == $label: corpus $corpusN queries $qN " +
        f"(truth wall $truthSec%.1fs)")

      def recallRow(name: String, df: => DataFrame,
                    candPerQuery: => Double): String = {
        val (got, sec) = timed(ids(df))
        val recalls = truth.map { case (q, t) =>
          got.get(q).map(g => (g & t).size.toDouble / t.size).getOrElse(0.0) }
        val mean = recalls.sum / recalls.size
        val worst = recalls.foldLeft(1.0)(math.min)
        val frac = candPerQuery / corpusN
        println(f"[recall] $name%-28s recall@$k mean $mean%.4f worst $worst%.4f " +
          f"cand-frac $frac%.4f wall $sec%.2fs")
        s"""{"corpus":"$label","variant":"$name","recall_mean":${f4(mean)},""" +
        s""""recall_worst":${f4(worst)},"cand_frac":${f4(frac)},""" +
        s""""wall_sec":${f4(sec)}}"""
      }

      def lshCand(nPlanes: Int, multiProbe: Boolean): Double = {
        val c = e.withColumn("cell", hyperplane_bucket(col("embedding"), nPlanes, 64))
        val base = hyperplane_bucket(col("embedding"), nPlanes, 64)
        val probes =
          if (!multiProbe) array(base)
          else array((base +: (0 until nPlanes).map(p => base.bitwiseXOR(lit(1 << p)))): _*)
        val q = queries.withColumn("cell", explode(probes))
          .select(col("vec_id").as("query_id"), col("cell"))
        c.join(q, Seq("cell")).count().toDouble / qN
      }
      // train ONCE per (seedMode, iters) config, reuse for every nprobe
      // row — probing is the dial, training is the index. The corpus
      // cell assignment + per-cell sizes and the full probe RANKING
      // depend only on the centroids, so they are computed once per
      // config too; each nprobe row just cuts the ranking deeper.
      def ivfCandMeter(cents: Array[Array[Double]]): Int => Double = {
        val cellSizes = e
          .withColumn("cell", nearest_centroid(col("embedding"), cents))
          .groupBy("cell").count().collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        val centDf = spark.createDataFrame(
          cents.zipWithIndex.map { case (v, i) => (i, v) }.toSeq).toDF("cell", "cent")
        val ranked = queries.crossJoin(broadcast(centDf))
          .withColumn("score", graft.functions.VecFns.cosine(col("embedding"),
            transform(col("cent"), x => x.cast("float"))))
          .withColumn("pr", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
              .orderBy(col("score").desc, col("cell").asc)))
          .select("pr", "cell").collect()
          .map(r => r.getInt(0) -> cellSizes.getOrElse(r.getInt(1), 0L))
        (nprobe: Int) =>
          ranked.filter(_._1 <= nprobe).map(_._2).sum.toDouble / qN
      }

      // sketch-prefilter + exact re-rank (r13): cand_frac is the
      // exact-scored fraction m/|corpus| — the sketch pass touches
      // every row but only sketchDim/64 of the floats (recorded in the
      // variant name; the wall includes it)
      val sketchRows = for {
        (sd, frac) <- Seq((16, 0.01), (16, 0.05), (16, 0.10), (8, 0.05),
          (16, 0.25), (32, 0.10), (32, 0.25))
      } yield {
        val m = math.max(k, math.ceil(frac * corpusN).toInt)
        recallRow(f"sketch${sd}_rerank_m${(frac * 100).toInt}pct",
          Similarity.knnSketchRerank(queries, e, k, m = m, sketchDim = sd),
          m.toDouble)
      }
      // int8 serve knob (r15): same pass-1 ranking over quantized
      // sketches — 1 byte/element, 1/16 of the vector bytes. Recall
      // delta vs the float rows above IS the quantization cost.
      val q8Rows = for ((sd, frac) <- Seq((16, 0.05), (16, 0.10))) yield {
        val m = math.max(k, math.ceil(frac * corpusN).toInt)
        recallRow(f"sketch${sd}_q8_rerank_m${(frac * 100).toInt}pct",
          Similarity.knnSketchRerank(queries, e, k, m = m, sketchDim = sd,
            quantize = true),
          m.toDouble)
      }

      // recall-TARGETED serving (r16): the caller states recall, the
      // index's stored build-time curve picks m (AnnIndex.chooseM).
      // The row's measured recall vs ground truth is the test of the
      // curve itself — sampled self-queries at build predicting
      // held-out queries at serve.
      val targetRows = {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-recall-ix").toString
        graft.operators.AnnIndex.writeSketch(dir,
          e.select(col("vec_id"), col("embedding")),
          sketchDim = 16, dim = 64, curve = true)
        val meta = graft.operators.AnnIndex.loadSketchMeta(spark, dir)
        for (t <- Seq(0.8, 0.9)) yield {
          try {
            val m = graft.operators.AnnIndex.chooseM(meta, k, t)
            recallRow(f"sketch16_target${(t * 100).toInt}_m$m",
              graft.operators.AnnIndex.searchSketchAtRecall(
                spark, dir, queries, k, t),
              m.toDouble)
          } catch {
            case ex: IllegalArgumentException =>
              // curve ceiling below the target: refusing IS the contract
              println(s"[recall] target $t unreachable on $label: ${ex.getMessage}")
              s"""{"corpus":"$label","variant":"sketch16_target${(t * 100).toInt}",""" +
              s""""recall_mean":-1,"recall_worst":-1,"cand_frac":-1,"wall_sec":-1}"""
          }
        }
      }

      val nCells = if (label.startsWith("clustered")) 32 else 16
      val lshRows = Seq(
        recallRow("lsh_p4_single",
          Similarity.knnHyperplaneLSH(queries, e, k, nPlanes = 4, multiProbe = false),
          lshCand(4, multiProbe = false)),
        recallRow("lsh_p4_multiprobe",
          Similarity.knnHyperplaneLSH(queries, e, k, nPlanes = 4, multiProbe = true),
          lshCand(4, multiProbe = true)))
      // legacy training (lowid/i2, round-11 s04) vs shipped
      // k-means++-style (kcenter/i6, round-12 s04), both at i2/i6 so
      // seeding and iteration gains attribute separately
      val ivfRows = for {
        (seedMode, iters) <- Seq(("lowid", 2), ("lowid", 6),
          ("kcenter", 2), ("kcenter", 6))
        cents = Similarity.trainIvfCentroids(e, nCells, iters, 64, seedMode)
        meter = ivfCandMeter(cents)
        np <- Seq(1, 2, 4, 8)
      } yield {
        val tag = if (seedMode == "kcenter") "kpp" else seedMode
        recallRow(s"ivf_c${nCells}_np${np}_i${iters}_$tag",
          Similarity.knnIvf(queries, e, k, nCells = nCells, iters = iters,
            nprobe = np, trained = Some(cents)),
          meter(np))
      }
      sketchRows ++ q8Rows ++ targetRows ++ lshRows ++ ivfRows
    }

    val organic = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val organicRows = section("organic", organic,
      organic.filter(col("vec_id") < nQ))

    // two cluster tightnesses bracket real embedding corpora: sigma 0.7
    // = well-separated blobs (easy case), 1.8 = heavily overlapping
    // (hard case; between it and organic's no-structure floor)
    val easy = clusteredCorpus(spark, n = 20000, dim = 64,
      nClusters = 32, sigma = 0.7, seed = 20260814L).localCheckpoint()
    val easyRows = section("clustered_s07", easy,
      easy.filter(col("vec_id") < nQ))
    val hard = clusteredCorpus(spark, n = 20000, dim = 64,
      nClusters = 32, sigma = 1.8, seed = 20260814L).localCheckpoint()
    val hardRows = section("clustered_s18", hard,
      hard.filter(col("vec_id") < nQ))

    val all = organicRows ++ easyRows ++ hardRows
    val json =
      s"""{"metric":"ann_recall","k":$k,""" +
      s""""clustered_spec":{"n":20000,"dim":64,"clusters":32,"sigmas":[0.7,1.8]},""" +
      s""""variants":${all.mkString("[", ",", "]")}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_ann_recall.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
