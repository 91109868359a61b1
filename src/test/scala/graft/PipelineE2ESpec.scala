package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.{Compactor, Lineage}
import graft.streaming.FlushStream

/** Full pipeline e2e (reference `tests/flushers/test_local_lake.py`
  * shape): many small files -> compacted text bundles -> streaming
  * flush into a partitioned lake -> lineage manifest. Asserts no
  * record is lost across the whole chain and lineage covers every
  * bundle.
  */
class PipelineE2ESpec extends SparkSpec {

  test("compact -> flush -> lineage end to end, no records lost") {
    implicit val s = spark
    import s.implicits._
    val lake = tmpDir("e2e_lake"); val collected = tmpDir("e2e_collected")
    val dest = tmpDir("e2e_dest"); val ckpt = tmpDir("e2e_ckpt")
    val manifestDir = tmpDir("e2e_manifest")

    // 1. a lake of 80 small json files with increasing mtimes
    val bodies = (1 to 80).map { i =>
      val body = s"""{"i":$i,"pad":"${"y" * (i % 53)}"}"""
      val p = Paths.get(lake.toString, f"part$i%03d.json")
      Files.write(p, body.getBytes("UTF-8"))
      p.toFile.setLastModified(1700000000000L + i * 500L)
      body
    }

    // 2. collector stage: size-bundled text output ("collected" dir)
    val manifest = Compactor.compactToText(
      lake.toString, collected.toString, targetBytes = 600L, codec = None)
    val nBundles = manifest.count()
    assert(nBundles > 1, "expected multiple bundles")
    assert(manifest.agg(sum($"n_records")).collect()(0).getLong(0) == 80)

    // 3. flusher stage: stream the collected bundles to the lake
    val q = FlushStream.flushToPartitionedLake(
      spark, collected.toString, dest.toString, ckpt.toString,
      Trigger.AvailableNow())
    q.awaitTermination(120000)

    // 4. lineage: record the manifest for this run, read it back
    Lineage.appendFlushManifest(manifest, manifestDir.toString, "e2e-run", dest.toString)
    val lineage = Lineage.flushedBundles(spark, manifestDir.toString)
    assert(lineage.count() == nBundles)

    // 5. chain invariant: every source record text survives to the dest
    val shipped = spark.read.parquet(dest.toString)
      .select($"content").as[String].collect().flatMap(_.split("\n")).toSet
    assert(bodies.toSet.subsetOf(shipped), "records lost in flight")
  }

  test("two checkpointed hops (collector -> flusher) deliver record-exact across a double restart") {
    import spark.implicits._
    import graft.streaming.FlushStream.PayloadRec
    val src = tmpDir("hop_src"); val bundles = tmpDir("hop_bundles")
    val ckptA = tmpDir("hop_ckptA"); val dest = tmpDir("hop_dest")
    val ckptB = tmpDir("hop_ckptB")
    val target = 150L // ~15 records per bundle; a bundle stays OPEN at restart

    def rec(i: Int) = PayloadRec("k", i.toLong, i.toLong * 10, 10L, f"rec-$i%03d")
    def writeBatch(name: String, ids: Range): Unit =
      ids.map(rec).toDS().coalesce(1).write.parquet(s"$src/$name")

    val schema = implicitly[org.apache.spark.sql.Encoder[PayloadRec]].schema
    def runA(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$src/*").as[PayloadRec]
      val q = FlushStream.bundleTextFileSink(
        stream, target, bundles.toString, ckptA.toString)
      q.awaitTermination(120000); ()
    }
    def runB(): Unit = {
      val q = FlushStream.flushToPartitionedLake(
        spark, bundles.toString, dest.toString, ckptB.toString,
        Trigger.AvailableNow())
      q.awaitTermination(120000); ()
    }
    def landed(): Set[String] = spark.read.parquet(dest.toString)
      .select($"content").as[String].collect()
      .flatMap(_.split("\n")).toSet

    // leg 1: collector drains batch 1 into bundle files, flusher ships them
    writeBatch("b1", 1 to 40)
    runA(); runB()
    assert(landed() == (1 to 40).map(i => f"rec-$i%03d").toSet)

    // leg 2: BOTH hops restart on their checkpoints mid-pipeline — the
    // open bundle's (seq, bytes) state and both source offsets recover
    writeBatch("b2", 41 to 80)
    runA(); runB()
    val all = spark.read.parquet(dest.toString)
      .select($"content").as[String].collect().flatMap(_.split("\n")).toSeq
    assert(all.length == all.distinct.length, "a record was double-shipped")
    assert(all.toSet == (1 to 80).map(i => f"rec-$i%03d").toSet,
      "records lost across the two-hop restart")

    // rotation state carried the restart: batch-2 records continue the
    // bundle sequence the single-writer fold assigns over ALL records
    val expectedSeqs = {
      var seq = 0L; var bytes = 0L; var n = 0L
      (1 to 80).map { i =>
        if (n > 0 && bytes + 10L >= target) { seq += 1; bytes = 0; n = 0 }
        bytes += 10L; n += 1
        f"rec-$i%03d" -> seq
      }.toMap
    }
    val gotSeqs = spark.read.text(bundles.toString)
      .select($"value", input_file_name().as("f")).collect()
      .map { r =>
        val seq = "bundle_seq=(\\d+)".r.findFirstMatchIn(r.getAs[String]("f"))
          .get.group(1).toLong
        r.getAs[String]("value") -> seq
      }.toMap
    assert(gotSeqs == expectedSeqs, "bundle assignment diverged from the single-writer fold")
    assert(expectedSeqs.values.max >= 4, "test should span multiple rotations")

    // a third restart with no new data ships nothing new on either hop
    runA(); runB()
    assert(spark.read.parquet(dest.toString).count() ==
      spark.read.parquet(dest.toString).dropDuplicates("src_path", "content").count())
    assert(landed() == (1 to 80).map(i => f"rec-$i%03d").toSet)
  }

  test("streaming collector writes real bundle files matching the batch fold") {
    import spark.implicits._
    import graft.streaming.FlushStream.PayloadRec
    val src = tmpDir("bsink_src"); val bundles = tmpDir("bsink_bundles")
    val ckpt = tmpDir("bsink_ckpt")
    val target = 512L
    val recs = Tables.load(spark, sf0001, "events")
      .select($"event_type".as("key"), $"event_id", $"ts_ns",
        length($"props").cast("long").as("size"), $"props".as("payload"))
    recs.coalesce(1).write.mode("overwrite").parquet(src.toString)

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(src.toString).schema)
        .parquet(src.toString).as[PayloadRec]
      val q = graft.streaming.FlushStream.bundleFileSink(
        stream, target, bundles.toString, ckpt.toString)
      q.awaitTermination(120000); ()
    }
    runOnce()

    val got = spark.read.parquet(bundles.toString)
    // nothing lost, nothing duplicated — record-for-record
    assert(got.count() == recs.count())
    assert(got.select($"event_id").as[Long].collect().toSet ==
      recs.select($"event_id").as[Long].collect().toSet)

    // assignment equals the reference single-writer fold (c01 contract)
    val expected = recs.as[graft.streaming.FlushStream.BundleRec].collect()
      .groupBy(_.key).flatMap { case (k, rs) =>
        var seq = 0L; var bytes = 0L; var n = 0L
        rs.sortBy(r => (r.ts_ns, r.event_id)).iterator.map { r =>
          if (n > 0 && bytes + r.size >= target) { seq += 1; bytes = 0; n = 0 }
          bytes += r.size; n += 1
          r.event_id -> (k, seq)
        }
      }.toMap
    val gotAssign = got.select($"event_id", $"key", $"bundle_seq")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.get(2).toString.toLong)).toMap
    assert(gotAssign == expected)

    // bundle dirs are REAL partitions: a (key, seq) filter prunes
    val one = spark.read.parquet(bundles.toString)
      .filter($"key" === "click" && $"bundle_seq" === 0)
    one.collect()
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bundle_seq"))

    // restart on the same checkpoint re-ships nothing (file-sink manifest)
    runOnce()
    assert(spark.read.parquet(bundles.toString).count() == recs.count())
  }
}
