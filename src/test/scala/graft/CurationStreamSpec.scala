package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Caches, CorpusPipeline, IncrementalPipeline}
import graft.streaming.CurationStream

/** Continuous curation: each micro-batch must leave `outDir` holding
  * EXACTLY the rows the monolithic pipeline produces over everything
  * streamed so far (batch 0 bootstraps, later batches run the
  * incremental day), and both foreachBatch replay windows must be
  * no-ops — a fully-committed batch (marker present) and the
  * crash-after-state-commit window (marker deleted, ids at or below
  * the horizon).
  */
class CurationStreamSpec extends SparkSpec {

  private def docsAll: DataFrame = {
    import spark.implicits._
    Tables.load(spark, sf0001, "documents").select($"doc_id", $"text")
  }

  private val bench = col("doc_id") % 101 === 0

  private def budgetOf(docs: DataFrame): Long =
    docs.dropDuplicates("text")
      .agg(sum(size(graft.functions.TextFns.tokens(col("text")))))
      .collect()(0).getLong(0) * 6 / 10 / 4

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("streamed micro-batches == monolithic over everything seen; replay windows are no-ops") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = docsAll
    val mx = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val budget = budgetOf(docs)
    val cut = mx * 3 / 5
    def slice(lo: Long, hi: Long): Seq[(Long, String)] =
      docs.filter(col("doc_id") > lo && col("doc_id") <= hi)
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)

    val stateDir = Files.createTempDirectory("graft-cur-state").toString
    val outDir = Files.createTempDirectory("graft-cur-out").toString
    val cpDir = Files.createTempDirectory("graft-cur-cp").toString
    val params = IncrementalPipeline.Params(budget)

    val mem = MemoryStream[(Long, String)]
    val q = CurationStream.curationSink(
      mem.toDF().toDF("doc_id", "text"), stateDir, outDir, cpDir,
      bench, params)
    try {
      // batch 0: bootstrap
      mem.addData(slice(-1, cut): _*) // -1: doc_id 0 (a bench doc) included
      q.processAllAvailable()
      Caches.release()
      val mono0 = rows(CorpusPipeline.run(docs.filter(col("doc_id") <= cut),
        benchPred = bench, budgetPerStratum = budget, nShards = 64).out)
      assert(rows(spark.read.parquet(s"$outDir/batch_id=0")) == mono0,
        "batch 0 must bootstrap to the monolithic output over batch 0")
      // batch 1: incremental day
      mem.addData(slice(cut, mx): _*)
      q.processAllAvailable()
      Caches.release()
      val mono1 = rows(CorpusPipeline.run(docs, benchPred = bench,
        budgetPerStratum = budget, nShards = 64).out)
      assert(rows(spark.read.parquet(s"$outDir/batch_id=1")) == mono1,
        "batch 1 must equal the monolithic output over both batches")
      // replay window A — fully committed (marker present): no-op, and
      // the output partition is untouched (probe: drop it, replay must
      // NOT recreate it)
      val b1 = slice(cut, mx).toDF("doc_id", "text")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(s"$outDir/batch_id=1"))
      CurationStream.processBatch(b1, stateDir, outDir, bench, params, 1L)
      assert(!new java.io.File(s"$outDir/batch_id=1").exists(),
        "a marker-committed batch must be a complete no-op")
      // replay window B — crash after the pipeline's state commit but
      // before output/marker: marker gone, ids at/below horizon. The
      // replay must re-emit the SAME committed output (no state
      // advance, no horizon violation) and restore output + marker.
      rm(new java.io.File(s"$stateDir/commits/1"))
      Caches.release()
      CurationStream.processBatch(b1, stateDir, outDir, bench, params, 1L)
      assert(rows(spark.read.parquet(s"$outDir/batch_id=1")) == mono1,
        "the crash-window replay must re-emit the committed corpus")
      assert(new java.io.File(s"$stateDir/commits/1").exists())
      assert(IncrementalPipeline.committedHorizon(spark, stateDir)
        .contains(mx), "replay must not advance the horizon")
      // a MIXED batch (old + new ids) is not a replay — it is an
      // append-only id-discipline violation and must refuse loudly
      // instead of silently dropping the old-id rows
      val mixed = Seq((cut, "old id reused text"),
                      (mx + 10, "genuinely new text row")).toDF("doc_id", "text")
      val e = intercept[IllegalArgumentException](
        CurationStream.processBatch(mixed, stateDir, outDir, bench,
          params, 2L))
      assert(e.getMessage.contains("discipline"))
      // marker collision: a stream restarted with a NEW checkpoint
      // restarts batchIds at 0, so a leftover commits/<id> marker can
      // collide with a genuinely fresh batch — the marker must not
      // gate processing (only "marker AND ids <= horizon" is provably
      // a replay), or the fresh rows would be silently dropped
      new java.io.File(s"$stateDir/commits/7").createNewFile()
      val fresh = slice(cut, mx).map { case (id, t) => (id + mx + 1, t) }
        .toDF("doc_id", "text")
      Caches.release()
      CurationStream.processBatch(fresh, stateDir, outDir, bench, params, 7L)
      assert(IncrementalPipeline.committedHorizon(spark, stateDir)
        .contains(2 * mx + 1),
        "a stale marker from another checkpoint lineage must not drop a fresh batch")
      assert(new java.io.File(s"$outDir/batch_id=7").exists())
    } finally q.stop()
  }
}
