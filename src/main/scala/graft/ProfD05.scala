package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway d05 checksum+timing harness (not part of the library).
  * Prints wall, row count, and an order-independent checksum of the
  * full result (ids + rounded cos), so kernel rewrites can prove
  * bit-identical output at sf10 where the oracle gate doesn't run.
  */
object ProfD05 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = "/root/repo/benchdata/sf10"
    val e0 = Tables.load(spark, d, "embeddings")
    e0.count() // warm
    val cap = if (args.length > 0) args(0).toInt else 1024
    val t0 = System.nanoTime()
    val res = graft.operators.Dedup.embeddingPairs(
      e0, $"vec_id", $"embedding", $"label", minCos = 0.3, cellCap = cap)
    val n = res.count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[profd05] bench-equivalent count() wall=$wall%.2f s n=$n")
    val t1 = System.nanoTime()
    val sig = res.select(
        sum(xxhash64(col("cell"), col("id_a"), col("id_b"),
          col("cos").cast("string")).cast("decimal(38,0)")).as("sig"),
        count(lit(1)).as("n"))
      .collect()(0)
    val wall2 = (System.nanoTime() - t1) / 1e9
    println(f"[profd05] checksum wall=$wall2%.2f s n=${sig.getLong(1)} sig=${sig.getDecimal(0)}")
    spark.stop()
  }
}
