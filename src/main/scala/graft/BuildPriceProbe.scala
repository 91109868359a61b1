package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Index-BUILD pricing probe (VERDICT r18 note #3): the per-round
  * reset bench deliberately keeps the `writeOnce` memos warm —
  * t26/s05/s07 reset walls price select-against-existing-index, which
  * matches the production contract (build once, select daily) — so a
  * regression in a BUILD plan was invisible to the round comparator.
  * This main prices the three persisted-index builds cold, on the
  * same sf0.1 tables the gate queries read, with the gate queries'
  * own parameters:
  *
  *   - DsirIndex.write   (documents, 4096 buckets — t26's build)
  *   - AnnIndex.write    (embeddings IVF, nCells=16 iters=6 kcenter —
  *                        s05's build)
  *   - AnnIndex.writeSketch (embeddings, sketchDim 16 — s07's build)
  *
  * Best-of-2 settle-gated fresh-dir builds ([[graft.operators
  * .BuildOnce]] memos bypassed by calling the write paths directly).
  * Writes BENCH_buildprice_probe.json; run once per round so a
  * build-plan regression shows round-over-round.
  */
object BuildPriceProbe {

  private def f2(d: Double) = math.round(d * 100.0) / 100.0

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-buildprice-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 4096)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def settle(): Unit = {
      val t0 = System.nanoTime()
      def load = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      while (load > 4.0 && (System.nanoTime() - t0) / 1e9 < 120)
        Thread.sleep(5000)
    }
    def best2(body: String => Unit): Double =
      (0 until 2).map { _ =>
        settle()
        val dir = java.nio.file.Files
          .createTempDirectory("graft-buildprice").toString
        val t0 = System.nanoTime()
        body(dir)
        (System.nanoTime() - t0) / 1e9
      }.min

    val docs = Tables.load(spark, sfDir, "documents")
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding")
    val nDocs = docs.count(); val nVecs = emb.count()

    val tDsir = best2(dir =>
      graft.operators.DsirIndex.write(dir, docs, $"doc_id", $"text"))
    val tIvf = best2(dir =>
      graft.operators.AnnIndex.write(dir, emb,
        nCells = 16, iters = 6, dim = 64, seedMode = "kcenter"))
    val tSketch = best2(dir =>
      graft.operators.AnnIndex.writeSketch(dir, emb))

    val json =
      s"""{"metric":"buildprice_probe","sf_dir":"$sfDir",""" +
      s""""n_docs":$nDocs,"n_vecs":$nVecs,""" +
      s""""dsir_build_sec":${f2(tDsir)},"ivf_build_sec":${f2(tIvf)},""" +
      s""""sketch_build_sec":${f2(tSketch)},""" +
      s""""note":"best-of-2 settle-gated cold builds into fresh dirs; """ +
      s"""gate-query parameters (t26/s05/s07); reset bench prices """ +
      s"""select-only by design — this row prices the builds"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_buildprice_probe.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
