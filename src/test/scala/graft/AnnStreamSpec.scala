package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.AnnIndex
import graft.streaming.AnnStream

/** Streaming ANN-index maintenance: streamed batches must leave the
  * index row-identical to a one-shot build over everything seen, both
  * foreachBatch replay windows must be no-ops (marker present; marker
  * lost after a completed append), and the drift loop must re-ground a
  * decayed recall curve so the index keeps serving its stated target.
  */
class AnnStreamSpec extends SparkSpec {

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def vecCount(dir: String): Long =
    spark.read.parquet(s"$dir/vectors").count()

  test("streamed batches == one-shot build; both replay windows are no-ops") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val e = Tables.load(spark, sf0001, "embeddings")
      .select($"vec_id", $"embedding")
    def slice(lo: Long, hi: Long): Seq[(Long, Seq[Float])] =
      e.filter($"vec_id" >= lo && $"vec_id" < hi)
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    val s1 = slice(0, 250)
    val s2 = slice(250, 10000)

    val dir = Files.createTempDirectory("graft-ann-stream").toString
    val cp = Files.createTempDirectory("graft-ann-stream-cp").toString
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = AnnStream.annSink(
      mem.toDF().toDF("vec_id", "embedding"), dir, cp)
    try {
      mem.addData(s1: _*)
      q.processAllAvailable()
      mem.addData(s2: _*)
      q.processAllAvailable()
    } finally q.stop()

    // search through the streamed index == through a one-shot build
    val queries = e.filter($"vec_id" < 5)
    val oneShot = AnnIndex.writeSketchOnce(e)
    val got = rows(AnnIndex.searchSketch(spark, dir, queries, k = 5, m = 50))
    assert(got == rows(
      AnnIndex.searchSketch(spark, oneShot, queries, k = 5, m = 50)))
    assert(got.nonEmpty)

    // replay window 1: marker present — a replayed batch is a no-op
    val n0 = vecCount(dir)
    val b2 = s2.toDF("vec_id", "embedding")
    AnnStream.processBatch(b2, dir, batchId = 1L)
    assert(vecCount(dir) == n0)

    // replay window 2: append completed but the marker was lost — the
    // ids-already-indexed anti-join makes the re-append insert nothing
    val marker = new Path(s"$dir/commits/1")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(marker, false))
    AnnStream.processBatch(b2, dir, batchId = 1L)
    assert(vecCount(dir) == n0)
    assert(fs.exists(marker), "replay must restore the commit marker")
    assert(rows(AnnIndex.searchSketch(spark, dir, queries, k = 5, m = 50))
      == got)

    // duplicate ids inside one batch refuse loudly
    val dup = (s1.take(1) ++ s1.take(1)).toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      AnnStream.processBatch(dup, dir, batchId = 9L)
    }
    assert(ex.getMessage.contains("duplicate vec_ids"))

    // replay window 3: the original append crashed BETWEEN its table
    // writes (vectors landed, sketches torn). Simulate by appending
    // vectors directly, then replaying the batch: fresh is empty, so
    // the repair branch (not the append) must heal the orphans before
    // the marker commits.
    val torn = Seq((90001L, Seq.fill(64)(0.25f)), (90002L, Seq.fill(64)(0.5f)))
      .toDF("vec_id", "embedding")
    torn.toDF("vec_id", "c_vec").write.mode("append").parquet(s"$dir/vectors")
    val sketchCount0 = spark.read.parquet(s"$dir/sketches").count()
    AnnStream.processBatch(torn, dir, batchId = 2L)
    assert(spark.read.parquet(s"$dir/sketches").count() == sketchCount0 + 2,
      "replay of a torn append must heal the sketch orphans")
    assert(fs.exists(new Path(s"$dir/commits/2")))

    // marker collision: a stream restarted with a NEW checkpoint
    // restarts batchIds at 0, so a leftover commits/<id> marker from
    // the previous lineage can collide with a genuinely fresh batch —
    // the marker must not gate processing (the anti-join decides), or
    // the fresh vectors would be silently dropped
    fs.create(new Path(s"$dir/commits/7"), true).close()
    val nBefore = vecCount(dir)
    val freshUnderStaleMarker =
      Seq((91001L, Seq.fill(64)(0.75f)), (91002L, Seq.fill(64)(0.9f)))
        .toDF("vec_id", "embedding")
    AnnStream.processBatch(freshUnderStaleMarker, dir, batchId = 7L)
    assert(vecCount(dir) == nBefore + 2,
      "a stale marker from another checkpoint lineage must not drop a fresh batch")
    assert(rows(AnnIndex.searchSketch(spark, dir,
      freshUnderStaleMarker.select($"vec_id", $"embedding"), k = 1, m = 200))
      .nonEmpty)
  }

  test("an empty bootstrap batch must not poison the recall curve") {
    import spark.implicits._
    val dim = 64
    val dir = Files.createTempDirectory("graft-ann-empty").toString
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    AnnStream.processBatch(empty, dir, 0L, targetRecall = 0.5, k = 10)
    // nothing bootstrapped — no meta, just the commit marker
    val meta = new Path(s"$dir/sketch_meta")
    val fs = meta.getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(meta))
    assert(fs.exists(new Path(s"$dir/commits/0")))
    // the first non-empty batch bootstraps with a REAL curve
    val b1 = (0L until 60L).map { i =>
      (i, Seq.tabulate(dim)(d => if (d == (i % 3).toInt) 1f else 0f))
    }.toDF("vec_id", "embedding")
    AnnStream.processBatch(b1, dir, 1L, targetRecall = 0.5, k = 10)
    val m = graft.operators.AnnIndex.loadSketchMeta(spark, dir)
    assert(m.curveM.nonEmpty && m.curveM.forall(_ > 0))
    assert(m.curveRecall.forall(r => !r.isNaN))
  }

  test("drift loop: a decaying append re-grounds the curve and keeps the target served") {
    import spark.implicits._
    val dim = 64
    // batch 0: three exact-duplicate clusters on orthogonal axes — the
    // sketch ranks them perfectly, so the stored curve promises high
    // recall at tiny m
    val b0 = (0L until 60L).map { i =>
      (i, Seq.tabulate(dim)(d => if (d == (i % 3).toInt) 1f else 0f))
    }.toDF("vec_id", "embedding")
    // batch 1: 10x deterministic noise — recall at the stored tiny-m
    // grid collapses, tripping needsRetrain. Hash-based, NOT
    // sinusoidal: sin(a·i + b·d) expands to a 2-dim subspace of
    // (cos bd, sin bd), which a 16-dim sketch ranks perfectly and the
    // curve never decays.
    val b1 = (100L until 700L).map { i =>
      (i, Seq.tabulate(dim) { d =>
        (scala.util.hashing.MurmurHash3.productHash((i, d)) % 997) / 997f
      })
    }.toDF("vec_id", "embedding")

    val dir = Files.createTempDirectory("graft-ann-drift").toString
    AnnStream.processBatch(b0, dir, 0L, targetRecall = 0.5, k = 10)
    val meta0 = AnnIndex.loadSketchMeta(spark, dir)
    assert(meta0.curveM.nonEmpty)

    AnnStream.processBatch(b1, dir, 1L, targetRecall = 0.5, k = 10)
    val meta1 = AnnIndex.loadSketchMeta(spark, dir)
    // the refresh actually ran: the grid is a function of N, which grew
    // 11x — an unrefreshed meta would still carry batch 0's grid
    assert(meta1.curveM != meta0.curveM,
      s"expected a re-grounded curve; stored grid still ${meta1.curveM}")
    // the invariant the stream maintains: after the batch, the index
    // does not need retraining for its stated target
    assert(!AnnIndex.needsRetrain(spark, dir, k = 10, targetRecall = 0.5))
    // and the curve-driven serve path works against the new grid
    val queries = b0.limit(3)
    val served = AnnIndex.searchSketchAtRecall(spark, dir, queries,
      k = 10, targetRecall = 0.5)
    assert(served.count() > 0)
  }

  test("crash-window replay re-checks drift: an append that died before the " +
       "drift loop must not commit a decayed curve") {
    import spark.implicits._
    val dim = 64
    val b0 = (0L until 60L).map { i =>
      (i, Seq.tabulate(dim)(d => if (d == (i % 3).toInt) 1f else 0f))
    }.toDF("vec_id", "embedding")
    val b1 = (100L until 700L).map { i =>
      (i, Seq.tabulate(dim) { d =>
        (scala.util.hashing.MurmurHash3.productHash((i, d)) % 997) / 997f
      })
    }.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft-ann-crash-drift").toString
    AnnStream.processBatch(b0, dir, 0L, targetRecall = 0.5, k = 10)
    // simulate the original batch-1 run: the append completed but the
    // process died BEFORE needsRetrain/the marker — the index now
    // carries a decayed curve and no commit record
    AnnIndex.appendSketchVectors(dir, b1)
    assert(AnnIndex.needsRetrain(spark, dir, k = 10, targetRecall = 0.5),
      "fixture must actually decay the curve")
    // the restarted stream replays batch 1: fresh-empty and unmarked —
    // the drift loop must run HERE, not be deferred to the next append
    AnnStream.processBatch(b1, dir, 1L, targetRecall = 0.5, k = 10)
    assert(!AnnIndex.needsRetrain(spark, dir, k = 10, targetRecall = 0.5),
      "crash-window replay must re-ground the curve before committing")
    assert(new Path(s"$dir/commits/1").getFileSystem(
      spark.sessionState.newHadoopConf()).exists(new Path(s"$dir/commits/1")))
  }

  test("orphan repair trusts only same-lineage markers: foreign and unscoped " +
       "markers never elide it") {
    import spark.implicits._
    val dim = 64
    val b0 = (0L until 60L).map { i =>
      (i, Seq.tabulate(dim)(d => if (d == (i % 3).toInt) 1f else 0f))
    }.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft-ann-lineage").toString
    AnnStream.processBatch(b0, dir, 0L, lineage = "A")
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new Path(s"$dir/commits/A-0")))
    def tear(ids: Seq[Long]): Unit =
      ids.map(i => (i, Seq.fill(dim)(0.25f))).toDF("vec_id", "c_vec")
        .write.mode("append").parquet(s"$dir/vectors")
    def sketchCount = spark.read.parquet(s"$dir/sketches").count()
    val dup = b0.limit(5) // fully-duplicate replay payload
    // torn state + an UNSCOPED marker for the batch: a direct call with
    // no lineage must not trust it — repair runs, orphans heal
    tear(Seq(90001L, 90002L))
    fs.create(new Path(s"$dir/commits/1"), true).close()
    val s0 = sketchCount
    AnnStream.processBatch(dup, dir, 1L)
    assert(sketchCount == s0 + 2,
      "an unscoped marker must not elide the orphan repair")
    // torn again; lineage A has no A-1 marker yet (the unscoped one
    // does not count) — repair runs and then commits A-1
    tear(Seq(90003L))
    AnnStream.processBatch(dup, dir, 1L, lineage = "A")
    assert(sketchCount == s0 + 3,
      "a marker from outside this lineage must not elide the repair")
    assert(fs.exists(new Path(s"$dir/commits/A-1")))
    // same-lineage marker present: the replay is certified, repair is
    // elided (the optimization this scoping buys) — new orphans wait
    // for the batch that actually wrote them to replay
    tear(Seq(90004L))
    AnnStream.processBatch(dup, dir, 1L, lineage = "A")
    assert(sketchCount == s0 + 3,
      "a same-lineage marker should elide the repair on a certified replay")
    // a different lineage replaying the same batchId repairs again
    AnnStream.processBatch(dup, dir, 1L, lineage = "B")
    assert(sketchCount == s0 + 4,
      "lineage B must not ride on lineage A's marker")
  }

  test("a cross-lineage marker must not defer the drift re-check on a " +
       "fully-duplicate batch") {
    import spark.implicits._
    val dim = 64
    val b0 = (0L until 60L).map { i =>
      (i, Seq.tabulate(dim)(d => if (d == (i % 3).toInt) 1f else 0f))
    }.toDF("vec_id", "embedding")
    val b1 = (100L until 700L).map { i =>
      (i, Seq.tabulate(dim) { d =>
        (scala.util.hashing.MurmurHash3.productHash((i, d)) % 997) / 997f
      })
    }.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft-ann-xlineage").toString
    AnnStream.processBatch(b0, dir, 0L, targetRecall = 0.5, k = 10)
    // the decayed-curve append lands WITHOUT its drift loop running
    // (crash window), and — the cross-lineage twist — a marker for
    // batchId 1 already exists, left by a PREVIOUS checkpoint lineage
    // whose own batch 1 was entirely different content
    AnnIndex.appendSketchVectors(dir, b1)
    assert(AnnIndex.needsRetrain(spark, dir, k = 10, targetRecall = 0.5),
      "fixture must actually decay the curve")
    val m = new Path(s"$dir/commits/1")
    val fs = m.getFileSystem(spark.sessionState.newHadoopConf())
    fs.create(m, true).close()
    // the restarted stream replays batch 1: fresh-empty AND markered —
    // the stale marker certifies another lineage's run, so the (meta-
    // only) drift check must still run here, not ride on its word
    AnnStream.processBatch(b1, dir, 1L, targetRecall = 0.5, k = 10)
    assert(!AnnIndex.needsRetrain(spark, dir, k = 10, targetRecall = 0.5),
      "a marker of unknown provenance must not elide the drift re-check")
  }
}
