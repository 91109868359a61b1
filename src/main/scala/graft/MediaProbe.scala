package graft

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal decode-throughput probe (VERDICT r7 task 6): the media
  * family's scale datapoint. Generates ~1 GB of MIXED payloads in the
  * executors — real decodable PNGs (noisy deterministic pixels, so
  * they're incompressible like photos), real multi-frame animated GIFs
  * (the JDK sequence writer, same as MultimodalSpec), and opaque
  * pseudo-random blobs (the audio/video stand-ins) — then drives the
  * three m-family paths over the corpus and reports MB/s, rows/s and
  * the listener-counted task-failure total (the O1 tolerance contract:
  * corrupt/undecodable payloads must yield rows, never failed tasks):
  *   - `binaryStats` (m01's expression-only metadata pass),
  *   - `extractFeatures` (real ImageIO decode with stub fallback),
  *     verified against the generator's known PNG dimensions,
  *   - `sampleFrames` (m02's executor-side fan-out, k=4 frames capped
  *     at 64 KiB each).
  *
  * Usage: runMain graft.MediaProbe [workDir] [nRows]
  * Emits one JSON line (last stdout line) and writes
  * BENCH_media_probe.json in the cwd.
  */
object MediaProbe {

  /** Deterministic payload for one id. Mix: 30% PNG, 10% animated GIF,
    * 60% opaque blobs (~100-150 KB) — ~100 KB average across kinds.
    */
  private def makeRow(id: Long): (Long, String, Array[Byte], Int, Int) = {
    val rnd = new java.util.Random(id * 2654435761L + 11)
    (id % 10) match {
      case 0 | 1 | 2 =>
        // noisy RGB -> PNG compresses ~not at all: ~3 B/px + overhead
        val w = 120 + (id % 80).toInt
        val h = 100 + (id % 60).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rnd.nextInt(1 << 24)); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (id, "image", bos.toByteArray, w, h)
      case 3 =>
        // 6-frame animated GIF, per-frame noise (JDK sequence writer)
        val (w, h) = (96 + (id % 32).toInt, 64 + (id % 24).toInt)
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("gif").next()
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        (0 until 6).foreach { _ =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rnd.nextInt(1 << 24)); x += 1 }
            y += 1
          }
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, null), null)
        }
        writer.endWriteSequence(); writer.dispose(); ios.close()
        (id, "video", bos.toByteArray, w, h)
      case _ =>
        // opaque incompressible blob: audio/video payloads the
        // container has no codec for — MUST take the stub path, not
        // fail the task
        val bytes = new Array[Byte](100 * 1024 + (id % 50).toInt * 1024)
        rnd.nextBytes(bytes)
        (id, "audio", bytes, -1, -1)
    }
  }

  def main(args: Array[String]): Unit = {
    val work = if (args.length > 0) args(0)
               else "/root/repo/benchdata/mediaprobe"
    val nRows = if (args.length > 1) args(1).toLong else 10000L

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.Multimodal
    import graft.operators.Multimodal.MediaRow

    // zero-task-failure contract: count every non-success task end
    val failedTasks = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.reason != org.apache.spark.Success) failedTasks.incrementAndGet()
      })

    val corpusDir = s"$work/corpus"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    // generate IN THE EXECUTORS (a driver loop encoding 1 GB of PNGs is
    // exactly the collect-style bottleneck the engine bans); exp_w/
    // exp_h ride along so decode output is verifiable against ground
    // truth
    spark.range(nRows).repartition(256)
      .mapPartitions(_.map(r => makeRow(r)))(
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING,
          Encoders.BINARY, Encoders.scalaInt, Encoders.scalaInt))
      .toDF("media_id", "kind", "payload", "exp_w", "exp_h")
      .write.parquet(corpusDir)
    val corpus = spark.read.parquet(corpusDir)
    val totalBytes = corpus.agg(sum(length(col("payload"))))
      .collect()(0).getLong(0)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // m01: expression-only metadata pass (no decode)
    val (statRows, tStats) = timed {
      Multimodal.binaryStats(corpus, "media_id", "payload")
        .agg(count(lit(1)), max(length(col("checksum")))).collect()(0).getLong(0)
    }

    // feature extraction: REAL ImageIO decode + stub fallback
    val media = corpus.select(col("media_id"), col("kind"), col("payload"))
      .as[MediaRow](Encoders.product[MediaRow])
    val (featRows, tFeat) = timed {
      Multimodal.extractFeatures(media).count()
    }
    // ground truth: every PNG/GIF row must carry its REAL encoded
    // dimensions (stub fallback on a decodable payload would be a
    // silent correctness loss, not just a perf miss)
    val feats = Multimodal.extractFeatures(media).toDF()
    val badDecodes = feats
      .join(corpus.select(col("media_id"), col("exp_w"), col("exp_h")), "media_id")
      .filter(col("exp_w") > 0 &&
        (col("width") =!= col("exp_w") || col("height") =!= col("exp_h")))
      .count()
    require(badDecodes == 0L, s"$badDecodes decodable payloads mis-decoded")
    require(featRows == nRows, s"featRows=$featRows != $nRows")
    // the stated tolerance contract: corrupt payloads yield rows, never
    // failed tasks — assert it, don't just report it
    require(failedTasks.get() == 0,
      s"${failedTasks.get()} task failures; per-file error isolation broken")

    // m02: frame sampling fan-out, 4 frames capped at 64 KiB
    val (frameAgg, tFrames) = timed {
      Multimodal.sampleFrames(media, k = 4, frameBytes = 64 * 1024)
        .toDF().agg(count(lit(1)), sum(length(col("frame_bytes"))))
        .collect()(0)
    }
    val frameRows = frameAgg.getLong(0)
    val frameBytesOut = frameAgg.getLong(1)

    def f0(d: Double) = math.round(d)
    def f2(d: Double) = math.round(d * 100.0) / 100.0
    val mb = totalBytes / 1e6
    val json =
      s"""{"metric":"media_throughput","rows":$nRows,"payload_bytes":$totalBytes,""" +
      s""""stats_sec":${f2(tStats)},"stats_mb_per_sec":${f0(mb / tStats)},""" +
      s""""stats_rows_per_sec":${f0(nRows / tStats)},""" +
      s""""decode_sec":${f2(tFeat)},"decode_mb_per_sec":${f0(mb / tFeat)},""" +
      s""""decode_rows_per_sec":${f0(nRows / tFeat)},""" +
      s""""frames_sec":${f2(tFrames)},"frames_mb_per_sec":${f0(mb / tFrames)},""" +
      s""""frame_rows":$frameRows,"frame_bytes_out":$frameBytesOut,""" +
      s""""verified_decodes":true,"mis_decodes":$badDecodes,""" +
      s""""task_failures":${failedTasks.get()},"cpus":$cpus,"errors":0}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_media_probe.json"),
      (json + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => }
    println(json)
    spark.stop()
  }
}
