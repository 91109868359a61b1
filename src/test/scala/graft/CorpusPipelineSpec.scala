package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusPipeline, Dedup}

/** Composition contract of the chained curation pipeline
  * ([[graft.operators.CorpusPipeline]]): stage count, survivor
  * monotonicity, the ONE-shingle-pass guarantee, id-set discipline
  * between stages, and pack/shard identities.
  */
class CorpusPipelineSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("composed pipeline: one shingle pass, monotone survivors, shard permutation") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val totalTok = docs
      .agg(sum(size(graft.functions.TextFns.tokens(col("text")))))
      .collect()(0).getLong(0)

    val sb0 = Dedup.shingleBuilds
    val res = CorpusPipeline.run(docs,
      benchPred = col("doc_id") % 97 === 0,
      budgetPerStratum = totalTok * 6 / 10 / 4,
      materialize = CorpusPipeline.Materialize.LocalCheckpoint,
      collectStats = true)
    val out = res.out.localCheckpoint()

    // stage roster is the pipeline's public contract
    assert(res.stats.map(_.stage) == Seq("gopher_filter", "exact_dedup",
      "near_dedup_decontam", "pii_redact", "token_pack", "shard_assign"))

    // the corpus was shingled at most once (0 = a previous test in this
    // JVM already memoized the same post-exact frame)
    assert(Dedup.shingleBuilds - sb0 <= 1,
      "near-dedup + decontamination must share one shingle pass")

    // filter stages only remove; the fixture must exercise every stage
    val n = res.stats.map(_.rowsOut)
    assert(n == n.sorted.reverse, s"survivors must be non-increasing: $n")
    assert(res.rowsAfter("gopher_filter") < docs.count(),
      "gopher filter must drop something on this fixture")
    assert(res.rowsAfter("near_dedup_decontam") < res.rowsAfter("exact_dedup"),
      "near dedup must drop something on this fixture")
    assert(res.rowsAfter("token_pack") < res.rowsAfter("pii_redact"),
      "the 60% budget must make the pack bite")

    // shard stage is a permutation of the packed set with dense 1..n
    // positions per shard
    assert(res.rowsAfter("shard_assign") == res.rowsAfter("token_pack"))
    assert(CorpusPipeline.nonDensePositionShards(out) == 0,
      "per-shard positions must be dense 1..n")

    // every emitted doc survived every filter: output ids are a subset
    // of the input ids (and unique)
    assert(out.select("doc_id").distinct().count() == out.count())
    assert(out.join(docs, Seq("doc_id"), "left_anti").count() == 0)
  }

  test("materialization policy changes execution, never results: fused None == staged LocalCheckpoint") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val pred = col("doc_id") % 97 === 0
    // fused default: no per-stage pin, no stats — ONE Catalyst plan
    val fused = CorpusPipeline.run(docs, benchPred = pred,
      budgetPerStratum = 5000L)
    assert(fused.stats.isEmpty, "stats are opt-in; default must collect none")
    val a = fused.out.localCheckpoint()
    // staged probe/spec config
    val b = CorpusPipeline.run(docs, benchPred = pred,
      budgetPerStratum = 5000L,
      materialize = CorpusPipeline.Materialize.LocalCheckpoint,
      collectStats = true).out
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "fused and staged configurations must emit identical rows")
    // composition invariants hold under the fused config too
    assert(CorpusPipeline.nonDensePositionShards(a) == 0)
    assert(a.select("doc_id").distinct().count() == a.count())
    assert(a.join(docs, Seq("doc_id"), "left_anti").count() == 0)
  }

  test("persist policy pins stages at a replicated-capable level and matches") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(2000)
    val pred = col("doc_id") % 97 === 0
    val p = CorpusPipeline.run(docs, benchPred = pred,
      budgetPerStratum = 3000L,
      materialize = CorpusPipeline.Materialize.Persist(),
      collectStats = true)
    val d = CorpusPipeline.run(docs, benchPred = pred,
      budgetPerStratum = 3000L)
    assert(p.stats.map(_.stage).size == 6)
    assert(p.out.exceptAll(d.out).isEmpty && d.out.exceptAll(p.out).isEmpty)
    p.out.sparkSession.sharedState.cacheManager.clearCache()
  }

  test("pipeline is deterministic: a rerun emits the identical shard assignment") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val a = CorpusPipeline.run(docs, benchPred = col("doc_id") % 97 === 0,
      budgetPerStratum = 5000L).out
    val b = CorpusPipeline.run(docs, benchPred = col("doc_id") % 97 === 0,
      budgetPerStratum = 5000L).out
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "composed pipeline must be run-to-run stable")
  }
}
