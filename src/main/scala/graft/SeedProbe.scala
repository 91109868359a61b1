package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** k-center seeding scale probe: the distributed farthest-point path
  * ([[graft.operators.Similarity.kcenterSeedsDistributed]]) against the
  * capped driver traversal, at a sub-cap N (where both see identical
  * samples and must agree seed-for-seed) and at 5× the driver cap
  * (where the driver path silently samples down to 100k and the
  * distributed path keeps exact full-corpus semantics with O(k) driver
  * bytes). The claim measured: distributed wall grows with executor
  * work only — the driver never holds more than the k chosen seeds —
  * so seeding no longer has an N where quality degrades or the driver
  * becomes the bottleneck.
  *
  * Synthetic hash-noise vectors (dim 64, xxhash64-derived floats):
  * deterministic, no testdata dependency, and adversarial for seeding
  * (no cluster structure — every round's argmin is a genuine
  * full-corpus reduction).
  *
  * Writes BENCH_seed_probe.json; last stdout line is the JSON.
  */
object SeedProbe {

  private def f2(d: Double) = math.round(d * 100.0) / 100.0
  private def f2d(d: Double) = math.round(d * 1e6) / 1e6

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-seed-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity

    val dim = 64
    val k = 64
    def vecs(n: Long) = spark.range(0L, n, 1L, cpus.toInt)
      .select(col("id").as("vec_id"),
        expr(s"transform(sequence(0, ${dim - 1}), " +
          "d -> cast(cast(xxhash64(id * 64 + d) % 997 as float) / 997.0 " +
          "as float))").as("embedding"))

    def settle(): Unit = {
      val t0 = System.nanoTime()
      def load = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      while (load > 4.0 && (System.nanoTime() - t0) / 1e9 < 120)
        Thread.sleep(5000)
    }
    def best2[T](body: => T): (T, Double) = {
      var out: Option[T] = None
      val walls = (0 until 2).map { _ =>
        settle()
        val t0 = System.nanoTime()
        out = Some(body)
        (System.nanoTime() - t0) / 1e9
      }
      (out.get, walls.min)
    }

    val nSmall = 50000L // sub-cap: identical samples, seeds must agree
    val nBig = 500000L  // 5x SeedSampleCap: driver path degrades to a sample
    val small = vecs(nSmall).cache()
    small.count()
    val (sDrv, tSmallDrv) = best2(Similarity.kcenterSeeds(small, k))
    val (sDist, tSmallDist) = best2(Similarity.kcenterSeedsDistributed(small, k))
    val equalSmall = sDrv.map(_.toSeq).toSeq == sDist.map(_.toSeq).toSeq
    small.unpersist()

    val big = vecs(nBig).cache()
    big.count()
    val (_, tBigDrv) = best2(Similarity.kcenterSeeds(big, k)) // cap engages
    val (_, tBigDist) = best2(Similarity.kcenterSeedsDistributed(big, k))
    big.unpersist()

    // ---- large-k regime (r18): the recompute form's k²/2 term vs the
    // carried-state column (running max folded per round + lineage
    // checkpoint every 16 rounds). The √N auto-dial puts production k
    // in the hundreds-to-thousands, where k² bites — probe both forms
    // so Similarity.KcenterStateThreshold sits between measured points.
    // Equality of the two forms is pinned at k=130 on the 50k corpus
    // (crosses the checkpoint-retruncation boundary 8 times; the
    // k=20 spec pin covers one crossing), then walls at 500k — single
    // settle-gated runs (each is minutes; the small-k rows above carry
    // the best-of-2 discipline).
    val small2 = vecs(nSmall).cache(); small2.count()
    val eqRec = Similarity.kcenterSeedsDistributed(small2, 130,
      carryState = Some(false))
    val eqCar = Similarity.kcenterSeedsDistributed(small2, 130,
      carryState = Some(true))
    val equalLargeK = eqRec.map(_.toSeq).toSeq == eqCar.map(_.toSeq).toSeq
    small2.unpersist()
    val big2 = vecs(nBig).cache(); big2.count()
    def wall(body: => Unit): Double = {
      settle(); val t0 = System.nanoTime(); body
      (System.nanoTime() - t0) / 1e9
    }
    val recW = Seq(128, 256).map(kk => kk -> wall {
      Similarity.kcenterSeedsDistributed(big2, kk, carryState = Some(false))
    })
    val carW = Seq(128, 256, 512, 1024).map(kk => kk -> wall {
      Similarity.kcenterSeedsDistributed(big2, kk, carryState = Some(true))
    })
    big2.unpersist()
    def kmap(xs: Seq[(Int, Double)]) =
      xs.map { case (kk, w) => s"\"$kk\":${f2(w)}" }.mkString("{", ",", "}")
    val largeK =
      s""""large_k":{"n":$nBig,"equal_at_130":$equalLargeK,""" +
      s""""recompute_sec":${kmap(recW)},"carried_sec":${kmap(carW)},""" +
      s""""threshold":${Similarity.KcenterStateThreshold},""" +
      s""""note":"single settle-gated walls; carried = running-max """ +
      s"""column, ckpt every 16 rounds"},"""

    // ---- oversampled (k-means||) regime (r19): the bounded-round form
    // kcenterSeedsDistributed delegates to above KcenterRoundCeiling.
    // k=4096 at N=1M is the sqrt-N auto-dial's own operating point
    // (k ~= sqrt(1e6 * 16)) — the carried sequential form extrapolates
    // to ~0.22 s/round x 4096 rounds x 2 (N doubling 500k -> 1M) there;
    // the oversampled form runs 2*rounds+1 jobs total. Quality is
    // scored as cosine-distance coverage (d = 1 - max cos to the seed
    // set) over a deterministic 20k-row sample, against the capped
    // driver path (exact traversal over a SeedSampleCap sample — the
    // silent-quality-degradation baseline) and lowid (no spread at all).
    val nOver = 1000000L
    val kOver = 4096
    val over = vecs(nOver).cache(); over.count()
    var overSeeds: Array[Array[Double]] = null
    val tOver = wall { overSeeds = Similarity.kcenterSeedsDistributed(over, kOver) }
    var drvSeeds: Array[Array[Double]] = null
    val tOverDrv = wall { drvSeeds = Similarity.kcenterSeeds(over, kOver) }
    val lowSeeds = over.orderBy(col("vec_id")).limit(kOver)
      .collect().map(_.getSeq[Float](1).toArray.map(_.toDouble))
    def coverage(seeds: Array[Array[Double]]): (Double, Double) = {
      import graft.expressions.NativeFns.{max_cos, vec_norm}
      val fs = seeds.map(_.map(_.toFloat))
      val ns = seeds.map(v => math.sqrt(v.map(x => x * x).sum))
      val r = over
        .filter(pmod(xxhash64(col("vec_id")), lit(50L)) === 0)
        .withColumn("_nm", vec_norm(col("embedding")))
        .filter(col("_nm") > 0)
        .select((lit(1.0) - max_cos(col("embedding"), col("_nm"), fs, ns)).as("d"))
        .agg(avg(col("d")), max(col("d"))).first()
      (r.getDouble(0), r.getDouble(1))
    }
    val (ovMean, ovMax) = coverage(overSeeds)
    val (drMean, drMax) = coverage(drvSeeds)
    val (loMean, loMax) = coverage(lowSeeds)
    over.unpersist()
    val carriedPerRound = carW.toMap.apply(1024) / 1024.0
    val carriedExtrap = carriedPerRound * kOver * (nOver.toDouble / nBig)
    val oversampled =
      s""""oversampled":{"n":$nOver,"k":$kOver,"rounds":5,"oversample":2.0,""" +
      s""""wall_sec":${f2(tOver)},"seeds":${overSeeds.length},""" +
      s""""driver_capped_wall_sec":${f2(tOverDrv)},""" +
      s""""carried_extrapolation_sec":${f2(carriedExtrap)},""" +
      s""""coverage_d_mean":{"oversampled":${f2d(ovMean)},"driver_capped":${f2d(drMean)},"lowid":${f2d(loMean)}},""" +
      s""""coverage_d_max":{"oversampled":${f2d(ovMax)},"driver_capped":${f2d(drMax)},"lowid":${f2d(loMax)}},""" +
      s""""note":"coverage d = 1 - maxcos over a 1-in-50 hash sample; """ +
      s"""driver_capped = exact traversal over a ${Similarity.SeedSampleCap}-row sample; """ +
      s"""carried extrapolation = measured sec/round at k=1024 x $kOver rounds x N ratio"},"""

    val json =
      s"""{"metric":"seed_probe","k":$k,"dim":$dim,$largeK$oversampled""" +
      s""""driver_cap":${Similarity.SeedSampleCap},""" +
      s""""sub_cap":{"n":$nSmall,"driver_sec":${f2(tSmallDrv)},""" +
      s""""dist_sec":${f2(tSmallDist)},"seeds_equal":$equalSmall},""" +
      s""""over_cap":{"n":$nBig,"driver_sec_capped_sample":${f2(tBigDrv)},""" +
      s""""dist_sec_exact_full_corpus":${f2(tBigDist)},""" +
      s""""driver_bytes_dist":${k * dim * 4},""" +
      s""""note":"driver path samples ${Similarity.SeedSampleCap} of $nBig """ +
      s"""(quality degrades silently); dist path is exact at full N with """ +
      s"""O(k) driver bytes"}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_seed_probe.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
