package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q15 stage-attribution harness (round 13, dev-only): solo sf10join
  * q15 sits at 8.8x while its join peers hold 3-5x. Times the
  * candidate sub-plans in one JVM — pruned scans, the partkey join
  * alone, each single-distinct aggregate alone, and the classic
  * two-distinct Expand form — so the wall attributes to a stage and
  * the rewrite is chosen on data, not plan aesthetics (the r13
  * distinct-first attempt measured WORSE, 21 s vs 12 s: a random
  * layout gives partial-distinct nothing to crush before the
  * shuffle).
  */
object Q15Prof {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/root/repo/benchdata/sf10join"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "256"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q15prof] $tag%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def mat(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()

    val l = Tables.load(spark, d, "lineitem")
      .select($"l_partkey", $"l_suppkey", $"l_orderkey")
    val p = Tables.load(spark, d, "part").select($"p_partkey", $"p_brand")

    timed("scan_lineitem_3col")(mat(l))
    timed("scan_part_2col")(mat(p))

    val jSmj = l.join(p, $"l_partkey" === $"p_partkey")
      .select($"p_brand", $"l_suppkey", $"l_orderkey")
    timed("join_smj_only")(mat(jSmj))
    val jShj = l.join(p.hint("shuffle_hash"), $"l_partkey" === $"p_partkey")
      .select($"p_brand", $"l_suppkey", $"l_orderkey")
    timed("join_shj_only")(mat(jShj))

    timed("supp_distinct_only")(mat(
      jShj.groupBy($"p_brand").agg(countDistinct($"l_suppkey").as("n"))))
    timed("ords_distinct_only")(mat(
      jShj.groupBy($"p_brand").agg(countDistinct($"l_orderkey").as("n"))))
    timed("expand_both_shj")(mat(
      jShj.groupBy($"p_brand").agg(
        countDistinct($"l_suppkey").as("n_suppliers"),
        countDistinct($"l_orderkey").as("n_orders"))))
    timed("expand_both_smj")(mat(
      jSmj.groupBy($"p_brand").agg(
        countDistinct($"l_suppkey").as("n_suppliers"),
        countDistinct($"l_orderkey").as("n_orders"))))

    // does the string agg key cost? brand -> dense int code via a
    // 25-row broadcast dictionary, aggs keyed int, names joined back
    import org.apache.spark.sql.expressions.Window
    val dict = p.select($"p_brand").distinct()
      .withColumn("bid", row_number().over(
        Window.orderBy($"p_brand")).cast("int"))
    val pCoded = p.join(broadcast(dict), "p_brand")
      .select($"p_partkey", $"bid")
    val jCoded = l.join(pCoded, $"l_partkey" === $"p_partkey")
      .select($"bid", $"l_suppkey", $"l_orderkey")
    timed("expand_both_intkey")(mat(
      jCoded.groupBy($"bid").agg(
        countDistinct($"l_suppkey").as("n_suppliers"),
        countDistinct($"l_orderkey").as("n_orders"))
        .join(broadcast(dict), "bid")
        .select($"p_brand", $"n_suppliers", $"n_orders")))
    spark.stop()
  }
}
