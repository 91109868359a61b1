package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFns, VecFns}
import graft.operators.Dedup

/** Null tolerance of the operator surface: the driver corpora have no
  * nulls today, but the library must not NPE when real data does.
  * Native expressions inherit null-in/null-out from nullSafeEval;
  * these tests pin that contract end to end.
  */
class NullSafetySpec extends SparkSpec {

  test("text operators pass nulls through without failing") {
    import spark.implicits._
    val df = Seq((1L, "hello world of spark"), (2L, null), (3L, ""))
      .toDF("doc_id", "text")
    val out = df.select(
      $"doc_id",
      TextFns.simhashBits(TextFns.tokens($"text")).as("sh"),
      graft.expressions.NativeFns.word_shingles($"text", 3).as("wsh"),
      md5(TextFns.normalizeText($"text")).as("fp"))
      .collect().sortBy(_.getLong(0))
    assert(out(0).getString(1).length == 32)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2) && out(1).isNullAt(3))
    assert(!out(2).isNullAt(1)) // empty text -> defined (all-zero-ish) hash
  }

  test("minhash candidate generation skips null texts") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e f g"), (2L, null), (3L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val cand = Dedup.minhashCandidates(df, $"doc_id", $"text").collect()
    // no pair involves the null doc; no exception raised
    assert(cand.forall(r => r.getLong(0) != 2L && r.getLong(1) != 2L))
  }

  test("vector operators pass nulls through") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (2L, null.asInstanceOf[Array[Float]], Array(1.0f, 0.0f)))
      .toDF("id", "a", "b")
    val out = df.select($"id", VecFns.cosine($"a", $"b").as("cos"))
      .collect().sortBy(_.getLong(0))
    assert(math.abs(out(0).getDouble(1) - 1.0) < 1e-12)
    assert(out(1).isNullAt(1))
  }

  test("composed pipeline drops null/empty-text docs at the quality gate, no NPE") {
    import spark.implicits._
    // a real crawl has null and empty bodies; the gopher stage's
    // token aggregation must silently exclude them (no token rows =>
    // no flags row => filtered), never crash a later stage
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, null.asInstanceOf[String]),
      (3L, ""),
      (4L, "a second normal document with the usual words of a crawl and more"))
      .toDF("doc_id", "text")
    val res = graft.operators.CorpusPipeline.run(docs,
      benchPred = lit(false), budgetPerStratum = 1000L, collectStats = true)
    val ids = res.out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(2L) && !ids.contains(3L),
      s"null/empty docs must not survive the quality gate: $ids")
    assert(res.rowsAfter("gopher_filter") == 2)
  }

  test("kcenter seeding skips zero-norm and survives a zero-vector corpus member") {
    import spark.implicits._
    val df = Seq(
      (0L, Array.fill(4)(0.0f)), // zero vector: excluded from seeding
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.9f, 0.1f, 0.0f, 0.0f)))
      .toDF("vec_id", "vec")
    val seeds = graft.operators.Similarity.kcenterSeeds(df, k = 2)
    assert(seeds.length == 2)
    // seed 0 = lowest NON-ZERO id (vec 1); seed 1 = farthest from it
    // (vec 2, orthogonal) — the zero vector must never be chosen
    assert(seeds(0).sameElements(Array(1.0, 0.0, 0.0, 0.0)))
    assert(seeds(1).sameElements(Array(0.0, 1.0, 0.0, 0.0)))
  }
}
