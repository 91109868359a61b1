package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.api.{LakeCollector, LakeFlusher}
import graft.operators.{CompactionConfig, FlushConfig}

/** The reference-shaped user API: collector pass then flusher lifecycle
  * (start -> drain -> stop -> restart resumes from checkpoint).
  */
class ApiSpec extends SparkSpec {

  test("LakeCollector one-shot pass bundles a small-file lake") {
    val in = tmpDir("api_in"); val out = tmpDir("api_out")
    (1 to 20).foreach { i =>
      val p = Paths.get(in.toString, s"f$i.json")
      Files.write(p, (s"""{"i":$i,"pad":"${"x" * 50}"}""").getBytes("UTF-8"))
      p.toFile.setLastModified(1700000000000L + i * 1000L)
    }
    val manifest = new LakeCollector(spark,
      CompactionConfig(in.toString, out.toString, targetBytes = 256L)).collect()
    val m = manifest.agg(sum("n_records"), count(lit(1))).collect()(0)
    assert(m.getLong(0) == 20)        // every record bundled
    assert(m.getLong(1) > 1)          // actually rotated into >1 bundle
    // bundles are readable back with their lineage columns
    val back = spark.read.parquet(out.toString)
    assert(back.count() == 20)
    assert(back.columns.contains("bundle_id"))
  }

  test("LakeFlusher lifecycle: start/drain/stop, restart ships nothing twice") {
    val collected = tmpDir("api_coll"); val dest = tmpDir("api_dest")
    val ckpt = tmpDir("api_ckpt")
    (1 to 3).foreach { i =>
      val p = Paths.get(collected.toString, s"b$i.collected")
      Files.write(p, s"payload-$i\n".getBytes("UTF-8"))
      p.toFile.setLastModified(1700000000000L)
    }
    val flusher = new LakeFlusher(spark,
      FlushConfig(collected.toString, dest.toString, ckpt.toString))
    val q = flusher.start(Trigger.AvailableNow())
    q.awaitTermination(60000)
    flusher.stop()
    assert(!flusher.isActive)
    assert(spark.read.parquet(dest.toString).count() == 3)

    // restart from the same checkpoint: exactly-once, nothing re-shipped
    val q2 = flusher.start(Trigger.AvailableNow())
    q2.awaitTermination(60000)
    flusher.stop()
    assert(spark.read.parquet(dest.toString).count() == 3)

    // double-start is rejected while active
    val q3 = flusher.start(Trigger.AvailableNow())
    intercept[IllegalArgumentException](flusher.start())
    q3.awaitTermination(60000)
    flusher.stop()
  }
}
