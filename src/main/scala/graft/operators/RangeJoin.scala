package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable range join. A plain non-equi join (`l.point BETWEEN r.lo
  * AND r.hi`) gives Spark no equi key, so it plans a broadcast/nested-
  * loop — quadratic at scale. Binning restores an equi key: intervals
  * explode into the fixed-width bins they overlap, points map to their
  * bin, the join is equi on the bin, and the residual BETWEEN filter
  * removes false positives inside the bin. Cost: |right| x
  * (interval/bin + 1) replicated rows — pick binWidth near the typical
  * interval length.
  */
object RangeJoin {

  /** Inner-join `points` (with numeric `pointCol`) to `intervals`
    * (with numeric `loCol`/`hiCol`, inclusive) on containment.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: Column, loCol: Column, hiCol: Column,
                      binWidth: Long): DataFrame = {
    require(binWidth >= 1)
    val p = points.withColumn("_bin", floor(pointCol / binWidth))
    val i = intervals.withColumn("_bin",
      explode(sequence(floor(loCol / binWidth), floor(hiCol / binWidth))))
    p.join(i, Seq("_bin"))
      .filter(pointCol >= loCol && pointCol <= hiCol)
      .drop("_bin")
  }
}
