package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` surface (SURVEY §2.10: the
  * engine-user extension point for typed aggregation over
  * `Dataset[T]`). Welford-style numeric summary: count/sum/min/max
  * in one pass, mergeable across partitions.
  */
object TypedAggs {

  case class NumSummary(n: Long, sum: Double, min: Double, max: Double) {
    def mean: Double = if (n == 0) 0.0 else sum / n
  }

  /** Summarize a numeric field of T in one pass. */
  class Summarize[T](f: T => Double) extends Aggregator[T, NumSummary, NumSummary] {
    override def zero: NumSummary =
      NumSummary(0L, 0.0, Double.PositiveInfinity, Double.NegativeInfinity)
    override def reduce(b: NumSummary, t: T): NumSummary = {
      val v = f(t)
      NumSummary(b.n + 1, b.sum + v, math.min(b.min, v), math.max(b.max, v))
    }
    override def merge(a: NumSummary, b: NumSummary): NumSummary =
      if (a.n == 0) b else if (b.n == 0) a
      else NumSummary(a.n + b.n, a.sum + b.sum,
        math.min(a.min, b.min), math.max(a.max, b.max))
    override def finish(r: NumSummary): NumSummary = r
    override def bufferEncoder: Encoder[NumSummary] = Encoders.product[NumSummary]
    override def outputEncoder: Encoder[NumSummary] = Encoders.product[NumSummary]
  }
}
