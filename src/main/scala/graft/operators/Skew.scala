package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (100 TB survival kit).
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on
  * by default here) splits oversized SORT-MERGE partitions at runtime
  * and is the first line of defense. Explicit salting remains necessary
  * when (a) the build side must be replicated per salt (broadcast-unsafe
  * sizes), or (b) a hot key dominates an AGGREGATION, which AQE does not
  * split. This operator implements the classic two-sided salt:
  * fact side gets `salt = pmod(hash(unique-ish col), n)`, the dimension
  * side is exploded n ways.
  */
object Skew {

  /** Null salt sources map to salt 0 — a null would propagate through
    * pmod and the inner join on (key, _salt) would drop rows a plain
    * equi-join on `key` keeps.
    */
  private def saltExpr(saltSource: Column, salts: Int): Column =
    coalesce(pmod(saltSource.cast("long"), lit(salts)), lit(0)).cast("int")

  /** Equi-join `fact` with `dim` on `key`, salting the key n ways.
    * Result equals a plain inner equi-join on `key`.
    */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
                     salts: Int, saltSource: Column): DataFrame = {
    require(salts >= 1)
    val f = fact.withColumn("_salt", saltExpr(saltSource, salts))
    val d = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    f.join(d, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase skew-safe aggregation: partial-aggregate on (key, salt),
    * then final-aggregate on key. `aggs` must be decomposable
    * (sum/count/min/max). Equals a direct groupBy(key).agg(...).
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     salts: Int, saltSource: Column): DataFrame = {
    val partial = df
      .withColumn("_salt", saltExpr(saltSource, salts))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_s"), count(lit(1)).as("_c"))
    partial.groupBy(col(key))
      .agg(sum(col("_s")).as(s"sum_$valueCol"), sum(col("_c")).as("n"))
  }
}
