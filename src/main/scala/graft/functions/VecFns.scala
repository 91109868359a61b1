package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column builders over `array<float>` columns.
  * Arithmetic is widened to double FIRST (float->double is exact) and
  * folded strictly left-to-right, so Spark and the DuckDB oracle perform
  * bit-identical IEEE operations.
  */
object VecFns {

  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity of two `array<float>` columns. Native one-pass
    * expression ([[graft.expressions.CosineSim]]); bit-identical to the
    * declarative chain below (same widen-then-strict-left-fold).
    */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.NativeFns.cosine_sim(a, b)

  /** Declarative cosine (cross-check reference; five interpreted array
    * traversals per row).
    */
  def cosineDeclarative(a: Column, b: Column): Column = {
    val da = toDouble(a)
    val db = toDouble(b)
    dot(da, db) / (norm(da) * norm(db))
  }
}
