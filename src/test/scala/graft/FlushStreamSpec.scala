package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.FlushStream

/** Streaming flush stage: AvailableNow drains a directory of bundles
  * into a partitioned lake exactly once; restart re-ships nothing
  * (checkpoint replaces the reference's lost-forever watchdog events —
  * SURVEY §3c).
  */
case class Ev(user_id: Long, value: Double)

class FlushStreamSpec extends SparkSpec {

  test("flush drains collected bundles into date-partitioned parquet, exactly once") {
    val collected = tmpDir("collected"); val dest = tmpDir("dest")
    val ckpt = tmpDir("ckpt")
    (1 to 3).foreach { i =>
      val p = Paths.get(collected.toString, s"bundle$i.collected")
      Files.write(p, (s"record-$i\n" * 10).getBytes("UTF-8"))
      p.toFile.setLastModified(1700000000000L)
    }
    Files.write(Paths.get(collected.toString, "empty.collected"), Array.emptyByteArray)

    def runOnce(): Unit = {
      val q = FlushStream.flushToPartitionedLake(spark, collected.toString,
        dest.toString, ckpt.toString, Trigger.AvailableNow())
      q.awaitTermination(60000); ()
    }
    runOnce()
    val out = spark.read.parquet(dest.toString)
    assert(out.count() == 3) // empty bundle skipped
    // mtime-derived partition columns exist and are populated
    // partition values come back type-inferred (year=2023 -> int)
    assert(out.select("year").distinct().collect().map(_.get(0).toString).toSeq == Seq("2023"))

    runOnce() // restart with same checkpoint: no re-shipping
    assert(spark.read.parquet(dest.toString).count() == 3)

    // the date partition columns actually PRUNE: a year filter must show
    // up as a PartitionFilter on the scan, not a post-scan Filter
    val pruned = spark.read.parquet(dest.toString).filter(col("year") === 2023)
    pruned.collect()
    val scanPlan = pruned.queryExecution.executedPlan.toString
    assert(scanPlan.contains("PartitionFilters") && scanPlan.contains("year"),
      s"expected partition pruning on year in:\n$scanPlan")

    // new bundle after restart is picked up incrementally
    val p = Paths.get(collected.toString, "bundle4.collected")
    Files.write(p, "late\n".getBytes("UTF-8"))
    p.toFile.setLastModified(1700000000000L)
    runOnce()
    assert(spark.read.parquet(dest.toString).count() == 4)
  }

  test("streaming hourly tumbling counts drain with AvailableNow") {
    import spark.implicits._
    val src = tmpDir("events_src2"); val ckpt = tmpDir("hr_ckpt")
    Tables.load(spark, sf0001, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .write.mode("overwrite").parquet(src.toString)
    val stream = spark.readStream
      .schema(spark.read.parquet(src.toString).schema)
      .parquet(src.toString)
    val q = graft.streaming.FlushStream.hourlyCounts(stream)
      .writeStream.format("memory").queryName("hourly")
      .outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("hourly")
    assert(got.count() > 0)
    // totals across closed windows match the batch count for those hours
    assert(got.agg(org.apache.spark.sql.functions.sum($"n")).collect()(0).getLong(0) > 0)
  }

  test("streaming dedup drops in-watermark duplicate keys") {
    import spark.implicits._
    val src = tmpDir("events_src3"); val ckpt = tmpDir("dd_ckpt")
    val ev = Tables.load(spark, sf0001, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type")
    // duplicate every event -> stream should restore original count
    ev.union(ev).write.mode("overwrite").parquet(src.toString)
    val stream = spark.readStream
      .schema(spark.read.parquet(src.toString).schema)
      .parquet(src.toString)
    val q = graft.streaming.FlushStream
      .dedupedStream(stream, Seq("event_id"), watermark = "10 days")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.table("dedup").count() == ev.count())
  }

  test("streaming dedup state is BOUNDED: watermark eviction shrinks state and re-admits old keys") {
    import spark.implicits._
    val src = tmpDir("ddw_src"); val ckpt = tmpDir("ddw_ckpt")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(plusMin: Long) = new java.sql.Timestamp(t0 + plusMin * 60000L)
    // one parquet FILE per micro-batch (maxFilesPerTrigger=1), mtimes
    // ascending so the source's (mtime, path) order IS the batch order
    var seq = 0
    def putBatch(rows: Seq[(Long, java.sql.Timestamp)]): Unit = {
      seq += 1
      val stage = tmpDir(s"ddw_stage$seq")
      rows.toDF("event_id", "ts").coalesce(1)
        .write.mode("overwrite").parquet(stage.toString)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(src, f"b$seq%02d.parquet")
      Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + seq * 1000L)
    }
    val tenDays = 10L * 24 * 60
    putBatch(Seq((1L, ts(0)), (2L, ts(1)), (1L, ts(2)))) // in-batch dup of 1
    putBatch(Seq((1L, ts(5)), (3L, ts(6))))              // cross-batch dup of 1
    putBatch(Seq((100L, ts(tenDays))))                   // jumps event time 10 days
    putBatch(Seq((101L, ts(tenDays + 1))))               // watermark now 10d-1h: evicts 1,2,3
    putBatch(Seq((1L, ts(tenDays + 2))))                 // old key PAST watermark: re-admitted

    val stream = spark.readStream
      .schema(spark.read.parquet(src.toString).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src.toString)
    val q = FlushStream.dedupedStream(stream, Seq("event_id"), watermark = "1 hour")
      .writeStream.format("memory").queryName("ddw")
      .outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    // within-watermark duplicates (in-batch AND cross-batch) dropped;
    // the same key arriving past the watermark is re-admitted — the
    // documented bounded-state divergence from batch d01/e04
    val ids = spark.table("ddw").select($"event_id").as[Long].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(ids == Map(1L -> 2, 2L -> 1, 3L -> 1, 100L -> 1, 101L -> 1), s"got $ids")

    // state metrics prove the bound: rows were REMOVED when the
    // watermark passed them, and final state is smaller than the peak
    val progresses = q.recentProgress.filter(_.stateOperators.nonEmpty)
    val totals = progresses.map(_.stateOperators.map(_.numRowsTotal).sum)
    val removed = progresses.map(_.stateOperators.map(_.numRowsRemoved).sum).sum
    assert(removed >= 3, s"expected watermark eviction of keys 1,2,3; removed=$removed")
    assert(totals.last < totals.max,
      s"state did not shrink after eviction: $totals")
  }

  test("stateful size-rotation emits the same bundles as a direct fold") {
    import spark.implicits._
    import graft.streaming.FlushStream.{BundleRec, BundleEmit}
    val src = tmpDir("rot_src"); val ckpt = tmpDir("rot_ckpt")
    val target = 256L // ~1.8KB of props per key at sf0.001 -> ~7 bundles each
    val recs = Tables.load(spark, sf0001, "events")
      .select($"event_type".as("key"), $"event_id", $"ts_ns",
        length($"props").cast("long").as("size"))
    recs.coalesce(1).write.mode("overwrite").parquet(src.toString)

    val stream = spark.readStream
      .schema(spark.read.parquet(src.toString).schema)
      .parquet(src.toString).as[BundleRec]
    val q = graft.streaming.FlushStream.sizeRotatedBundles(stream, target)
      .writeStream.format("memory").queryName("bundles")
      .outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("bundles").as[BundleEmit].collect()
      .map(b => (b.key, b.bundle_seq) -> (b.n_records, b.total_bytes, b.first_event))
      .toMap

    // reference fold (W1): rotate when current + next >= target
    val expected = recs.as[BundleRec].collect()
      .groupBy(_.key).flatMap { case (k, rs) =>
        var seq = 0L; var bytes = 0L; var n = 0L; var first = Long.MaxValue
        val closed = scala.collection.mutable.ArrayBuffer[((String, Long), (Long, Long, Long))]()
        rs.sortBy(r => (r.ts_ns, r.event_id)).foreach { r =>
          if (n > 0 && bytes + r.size >= target) {
            closed += ((k, seq) -> ((n, bytes, first)))
            seq += 1; bytes = 0; n = 0; first = Long.MaxValue
          }
          bytes += r.size; n += 1; first = math.min(first, r.event_id)
        }
        closed // open bundle stays in state, not emitted
      }.toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("size-rotation state carries the open bundle across micro-batches") {
    import spark.implicits._
    import graft.streaming.FlushStream.BundleRec
    val src = tmpDir("rot_src2"); val ckpt = tmpDir("rot_ckpt2")
    // one key, sizes chosen so a bundle closes only once batch 2 arrives:
    // batch1 = 3x100 bytes (stays open), batch2 = 1x100 -> closes at 400>=350
    def write(name: String, ids: Seq[Long]): Unit =
      ids.map(i => BundleRec("k", i, i, 100L)).toDS()
        .coalesce(1).write.parquet(s"$src/$name")
    write("b1", Seq(1L, 2L, 3L))
    write("b2", Seq(4L))
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[BundleRec]].schema)
      .option("maxFilesPerTrigger", "1") // one file per micro-batch
      .parquet(s"$src/*").as[BundleRec]
    val q = graft.streaming.FlushStream.sizeRotatedBundles(stream, 350L)
      .writeStream.format("memory").queryName("bundles2")
      .outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("bundles2").collect()
    // the closed bundle spans both micro-batches: 3 records, 300 bytes,
    // closed by record 4 which opened bundle 1 in state
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Long]("n_records") == 3L)
    assert(r.getAs[Long]("total_bytes") == 300L)
    assert(r.getAs[Long]("first_event") == 1L)
  }

  test("time half of W1: under-sized bundles close after maxAge with no new data") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.FlushStream.BundleRec
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[BundleRec]
    // target is unreachable: only the age clock can close a bundle here
    val q = FlushStream.sizeRotatedBundles(mem.toDS(), targetBytes = 1000000L,
        maxAgeMs = Some(1500L))
      .writeStream.format("memory").queryName("aged")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("250 milliseconds"))
      .start()
    try {
      def awaitRows(n: Int): Array[org.apache.spark.sql.Row] = {
        val deadline = System.currentTimeMillis() + 60000
        while (spark.table("aged").count() < n &&
               System.currentTimeMillis() < deadline) Thread.sleep(200)
        spark.table("aged").orderBy("bundle_seq").collect()
      }
      mem.addData(BundleRec("k", 1L, 10L, 100L))
      val first = awaitRows(1)
      assert(first.length == 1, "aged-out bundle never closed")
      assert(first(0).getAs[Long]("bundle_seq") == 0L)
      assert(first(0).getAs[Long]("n_records") == 1L)
      assert(first(0).getAs[Long]("total_bytes") == 100L)
      // a later record opens bundle 1 — sequence numbering survives the
      // timeout close — and ages out in turn
      mem.addData(BundleRec("k", 2L, 20L, 150L))
      val second = awaitRows(2)
      assert(second.length == 2, "second aged-out bundle never closed")
      assert(second(1).getAs[Long]("bundle_seq") == 1L)
      assert(second(1).getAs[Long]("n_records") == 1L)
      assert(second(1).getAs[Long]("total_bytes") == 150L)
    } finally q.stop()
  }

  test("restarting a size-only checkpoint with an age limit keeps the open bundle") {
    import spark.implicits._
    import graft.streaming.FlushStream.BundleRec
    val src = tmpDir("rot_legacy_src"); val ckpt = tmpDir("rot_legacy_ckpt")
    val out = tmpDir("rot_legacy_out")
    val schema = implicitly[org.apache.spark.sql.Encoder[BundleRec]].schema
    val emitSchema =
      implicitly[org.apache.spark.sql.Encoder[FlushStream.BundleEmit]].schema
    def write(name: String, id: Long): Unit =
      Seq(BundleRec("k", id, id * 10, 100L)).toDS()
        .coalesce(1).write.parquet(s"$src/$name")
    def stream = spark.readStream.schema(schema).parquet(s"$src/*").as[BundleRec]
    def emitted() = spark.read.schema(emitSchema).parquet(out.toString)

    // run 1: size-only rotation (NoTimeout) — the checkpointed open
    // bundle carries openedAt = -1. File sink: the memory sink cannot
    // recover from a checkpoint, and recovery is the point here.
    write("b1", 1L)
    val q1 = FlushStream.sizeRotatedBundles(stream, targetBytes = 1000000L)
      .writeStream.format("parquet").outputMode("append")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(120000)
    assert(emitted().count() == 0) // still open, in state

    // run 2: SAME checkpoint, now with an age limit. NoTimeout state
    // rows have no timeoutTimestamp field, so Spark's state schema
    // check REJECTS the migration loudly — the open bundle can never be
    // silently mis-aged. (With stateSchemaCheck=false a user can force
    // it; sizeRotatedBundles then treats the unknown open time as
    // opened-now rather than infinitely old — guards in the fold.)
    write("b2", 2L)
    val q2 = FlushStream.sizeRotatedBundles(stream, targetBytes = 1000000L,
        maxAgeMs = Some(5000L))
      .writeStream.format("parquet").outputMode("append")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.ProcessingTime("250 milliseconds")).start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable(); q2.awaitTermination(60000)
    }
    q2.stop()
    assert(err.toString.contains("STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE"),
      s"expected loud state-schema rejection, got: $err")

    // run 3: the rejected restart must not have corrupted the
    // checkpoint — resuming with the ORIGINAL size-only config drains
    // b2 and closes bundle 0 by size (record 2's 1 MB would overflow).
    write("b3", 3L)
    val big = Seq(BundleRec("k", 9L, 90L, 2000000L)).toDS()
    big.coalesce(1).write.parquet(s"$src/b4")
    val q3 = FlushStream.sizeRotatedBundles(stream, targetBytes = 1000000L)
      .writeStream.format("parquet").outputMode("append")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    q3.awaitTermination(120000)
    val rows = emitted().collect()
    assert(rows.length == 1, s"expected one closed bundle, got ${rows.toSeq}")
    // records 1..3 (100 B each) closed by the 2 MB record opening seq 1
    assert(rows(0).getAs[Long]("n_records") == 3L)
    assert(rows(0).getAs[Long]("total_bytes") == 300L)
    assert(rows(0).getAs[Long]("first_event") == 1L)
  }

  test("streaming clean-corpus equals the batch quality-gate + exact-dedup count") {
    import spark.implicits._
    import graft.functions.TextFns
    val src = tmpDir("docs_src"); val ckpt = tmpDir("cc_ckpt")
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text",
        to_timestamp(lit("2024-01-01 00:00:00")).as("ts"))
    // duplicate the corpus: stream dedup should collapse it back
    docs.union(docs).write.mode("overwrite").parquet(src.toString)
    val stream = spark.readStream
      .schema(spark.read.parquet(src.toString).schema)
      .parquet(src.toString)
    val q = graft.streaming.FlushStream
      .cleanCorpusStream(stream, minTokens = 20, watermark = "10 days")
      .writeStream.format("memory").queryName("cleaned")
      .outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val expected = docs
      .withColumn("n_tok", size(filter(
        split(lower($"text"), "[^a-z0-9]+"), w => w =!= "")))
      .filter($"n_tok" >= 20)
      .select(md5(TextFns.normalizeText($"text"))).distinct().count()
    assert(spark.table("cleaned").count() == expected)
    assert(expected > 0)
  }

  test("streaming simhash near-dup drops fingerprint collisions like batch") {
    import spark.implicits._
    import graft.functions.TextFns
    val src = tmpDir("nd_src"); val ckpt = tmpDir("nd_ckpt")
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text",
        to_timestamp(lit("2024-01-01 00:00:00")).as("ts"))
    docs.union(docs).write.mode("overwrite").parquet(src.toString)
    val stream = spark.readStream
      .schema(spark.read.parquet(src.toString).schema)
      .parquet(src.toString)
    val q = graft.streaming.FlushStream
      .nearDupStream(stream, bits = 32, watermark = "10 days")
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val expected = docs
      .select(TextFns.simhashBits(TextFns.tokens($"text"), 32))
      .distinct().count()
    assert(spark.table("neardup").count() == expected)
    assert(expected > 0 && expected <= docs.count())
  }

  test("streaming as-of via foreachBatch matches the batch merge") {
    import spark.implicits._
    import graft.operators.AsOf
    val src = tmpDir("asof_src"); val ckpt = tmpDir("asof_ckpt")
    val ev = Tables.load(spark, sf0001, "events")
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", unix_micros($"ts".cast("timestamp")).as("lt"))
    val dim = Tables.load(spark, sf0001, "orders")
      .select($"o_custkey".as("user_id"), $"o_orderkey",
        unix_micros($"o_orderdate".cast("timestamp")).as("rt"), $"o_totalprice")
    ev.write.mode("overwrite").parquet(src.toString)
    val acc = new java.util.concurrent.ConcurrentHashMap[Long, Option[Long]]()
    val stream = spark.readStream
      .schema(spark.read.parquet(src.toString).schema)
      .parquet(src.toString)
    val q = AsOf.backwardStream(stream, dim, "user_id", "lt", "rt",
      "o_orderkey", ckpt.toString) { (batch, _) =>
      batch.select($"event_id", $"o_orderkey").collect()
        .foreach(r => acc.put(r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
    }
    q.awaitTermination(120000)
    val batchResult = AsOf.backward(ev, dim, "user_id", "lt", "rt", "o_orderkey")
      .select($"event_id", $"o_orderkey").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    import scala.jdk.CollectionConverters._
    assert(acc.asScala.toMap == batchResult)
    assert(batchResult.nonEmpty)
  }

  test("stream-static enrichment joins each micro-batch to the dimension") {
    import spark.implicits._
    val src = tmpDir("enrich_src"); val ckpt = tmpDir("enrich_ckpt")
    Tables.load(spark, sf0001, "events")
      .select($"event_id", $"user_id", $"event_type")
      .write.mode("overwrite").parquet(src.toString)
    val dim = Tables.load(spark, sf0001, "customer")
      .select($"c_custkey".as("user_id"), $"c_mktsegment")
    val stream = spark.readStream
      .schema(spark.read.parquet(src.toString).schema)
      .parquet(src.toString)
    val q = graft.operators.AsOf.enrichStream(stream, dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("enriched")
    assert(got.count() == Tables.load(spark, sf0001, "events").count())
    // events with a known customer got a segment attached
    assert(got.filter($"c_mktsegment".isNotNull).count() > 0)
  }

  test("typed Aggregator summarizes a Dataset field") {
    import spark.implicits._
    import graft.functions.TypedAggs
    val ds = Tables.load(spark, sf0001, "events")
      .select($"user_id", $"value").as[Ev]
    val agg = new TypedAggs.Summarize[Ev](_.value).toColumn
    val got = ds.select(agg).collect()(0)
    val expected = ds.agg(
      org.apache.spark.sql.functions.count($"value"),
      org.apache.spark.sql.functions.round(org.apache.spark.sql.functions.sum($"value"), 6),
      org.apache.spark.sql.functions.min($"value"),
      org.apache.spark.sql.functions.max($"value")).collect()(0)
    assert(got.n == expected.getLong(0))
    assert(math.abs(got.sum - expected.getDouble(1)) < 1e-4)
    assert(got.min == expected.getDouble(2) && got.max == expected.getDouble(3))
  }

  test("streaming funnel matches the batch twin on a single drain and across an in-order split") {
    import spark.implicits._
    import graft.streaming.FunnelStream
    val W = 40L * 86400 * 1000 * 1000 * 1000 // > fixture span: no timeouts,
    // so the stream's restart trade can't fire and batch parity is exact
    val stages = Seq("view", "click", "purchase")

    // batch expectation, computed with the e07 recipe at the same window
    val ev = Tables.load(spark, sf0001, "events")
      .select($"user_id", $"event_type", $"ts_ns")
    val fv = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts_ns").as("a"))
    val fc = ev.filter($"event_type" === "click").join(fv, "user_id")
      .filter($"ts_ns" > $"a" && $"ts_ns" <= $"a" + W)
      .groupBy($"user_id").agg(min($"ts_ns").as("a"))
    val fp = ev.filter($"event_type" === "purchase").join(fc, "user_id")
      .filter($"ts_ns" > $"a" && $"ts_ns" <= $"a" + W)
      .groupBy($"user_id").agg(min($"ts_ns").as("a"))
    val expected = Seq(1 -> fv, 2 -> fc, 3 -> fp).map { case (i, df) =>
      i -> df.select($"user_id", $"a").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }.toMap

    def drain(srcDir: String, name: String, maxFiles: Option[Int]): Unit = {
      val ckpt = tmpDir(s"${name}_ckpt")
      var reader = spark.readStream
        .schema(spark.read.parquet(srcDir).schema)
      maxFiles.foreach(m => reader = reader.option("maxFilesPerTrigger", m))
      val q = FunnelStream.funnelStream(
          reader.parquet(srcDir), stages, W, watermark = "0 seconds")
        .writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    def got(name: String): Map[Int, Set[(Long, Long)]] =
      spark.table(name).collect()
        .map(r => (r.getAs[Int]("stage_idx"), (r.getAs[Long]("user_id"), r.getAs[Long]("ts_ns"))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    // single drain: all files in one batch
    val src1 = tmpDir("funnel_src1")
    Tables.load(spark, sf0001, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type")
      .coalesce(1).write.mode("overwrite").parquet(src1.toString)
    drain(src1.toString, "funnel1", None)
    assert(got("funnel1") == expected, "single-batch drain diverged from batch twin")

    // two in-order batches: split at the median ts, one flat file each
    // (mtime order drives FileStreamSource's single-file triggers)
    val src2 = tmpDir("funnel_src2")
    val all = Tables.load(spark, sf0001, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"ts_ns")
    val mid = all.agg(expr("percentile_approx(ts_ns, 0.5)")).collect()(0).getLong(0)
    Seq(("b1", all.filter($"ts_ns" <= mid)), ("b2", all.filter($"ts_ns" > mid)))
      .zipWithIndex.foreach { case ((name, df), i) =>
        val stage = tmpDir(s"funnel_stage_$name")
        df.drop("ts_ns").coalesce(1).write.mode("overwrite").parquet(stage.toString)
        val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
        val dest = Paths.get(src2.toString, s"$name.parquet")
        Files.copy(part.toPath, dest)
        dest.toFile.setLastModified(1700000000000L + i * 60000L)
      }
    drain(src2.toString, "funnel2", Some(1))
    assert(got("funnel2") == expected, "split drain diverged from batch twin")
  }

  test("funnel stream survives a data batch whose stored deadline the watermark already passed") {
    // Regression: with state anchored at T and window W, a later batch
    // that BOTH advances the watermark past T+W and carries new data
    // for the key invokes the function with data (the timeout callback
    // is preempted), and re-registering the stale deadline threw
    // IllegalArgumentException ("timeout timestamp <= watermark"),
    // failing the whole query. The fix evicts the dead attempt at
    // entry — exactly what the timeout would have done — and lets the
    // batch's events anchor a fresh funnel.
    import spark.implicits._
    import graft.streaming.FunnelStream
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val W = 1L * 1000 * 1000 * 1000 // 1 s window, far below the batch gap
    val src = tmpDir("funnel_late_src")
    val batches = Seq(
      // b1: user 1 anchors at t=1000 (deadline 1001); user 2 at t=1100
      // pushes the post-batch watermark to 1100 (delay 0s)
      Seq((1L, "view", ts(1000)), (2L, "view", ts(1100))),
      // b2: user 1 gets a fresh admitted view at t=1101 — data
      // invocation with stored deadline 1001 < watermark 1100
      Seq((1L, "view", ts(1101))))
    batches.zipWithIndex.foreach { case (rows, i) =>
      val stage = tmpDir(s"funnel_late_b$i")
      rows.toDF("user_id", "event_type", "ts")
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dest = Paths.get(src.toString, s"b$i.parquet")
      Files.copy(part.toPath, dest)
      dest.toFile.setLastModified(1700000000000L + i * 60000L)
    }
    val ckpt = tmpDir("funnel_late_ckpt")
    val q = FunnelStream.funnelStream(
        spark.readStream.schema(spark.read.parquet(src.toString).schema)
          .option("maxFilesPerTrigger", 1).parquet(src.toString),
        Seq("view", "click", "purchase"), W, watermark = "0 seconds")
      .writeStream.format("memory").queryName("funnel_late")
      .outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(q.exception.isEmpty,
      s"funnel stream died on the late-deadline batch: ${q.exception}")
    val got = spark.table("funnel_late").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("stage_idx"), r.getAs[Long]("ts_ns")))
      .toSet
    // user 1's expired attempt was evicted and the t=1101 view anchored
    // a NEW attempt — both stage-1 hits must be present
    assert(got == Set((1L, 1, 1000L * 1000000000L), (2L, 1, 1100L * 1000000000L),
                      (1L, 1, 1101L * 1000000000L)),
      s"unexpected funnel output: $got")
  }

  test("streaming sessionization emits session windows with AvailableNow") {
    import spark.implicits._
    val src = tmpDir("events_src"); val ckpt = tmpDir("sess_ckpt")
    Tables.load(spark, sf0001, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .write.mode("overwrite").parquet(src.toString)
    val stream = spark.readStream
      .schema(spark.read.parquet(src.toString).schema)
      .parquet(src.toString)
    val q = FlushStream.sessionized(stream)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("sessions")
    assert(got.count() > 0)
    assert(got.columns.contains("session_start") && got.columns.contains("n_events"))
  }
}
