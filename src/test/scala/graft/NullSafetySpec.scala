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
}
