package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage attribution for t20 at the 100x corpus (deleted or
  * ignored in production use; kept with the other probe mains).
  */
object T20Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","256")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = if (args.nonEmpty) args(0) else "/root/repo/benchdata/sf10"
    val docs = Tables.load(spark, dir, "documents")
    def timed(name: String)(f: => Long): Unit = {
      val t0=System.nanoTime(); val n=f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
    val toks = graft.functions.TextFns.tokens($"text")
    val shing = graft.functions.TextFns.shingles(toks, 3)
    timed("explode_only")(docs.select($"source", explode(shing).as("g")).count())
    timed("explode_native")(docs.select($"source",
      explode(graft.expressions.NativeFns.word_shingles($"text", 3)).as("g")).count())
    timed("explode_md5")(docs.select($"source",
      conv(substring(md5(explode(shing)),1,15),16,10).cast("long").as("sh")).count())
    val sh = docs.select($"source",
      conv(substring(md5(explode(shing)),1,15),16,10).cast("long").as("sh")).distinct()
    timed("distinct")(sh.count())
    timed("full_query")(SparkEntry.queries("t20_source_overlap")(spark, dir).count())
    spark.stop()
  }
}
