package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** d04 stage-attribution harness (VERDICT r11 task 7, dev-only): at
  * sf10 d04 is the slowest non-CC dedup row (26.2 s / 8.1x). Times its
  * three stages in one JVM — shingle pass, LSH candidate generation,
  * Jaccard refinement — so the wall attributes to a stage instead of a
  * query, and counts the candidate pairs so the pair-pressure
  * hypothesis is checkable against data growth.
  */
object D04Prof {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/root/repo/benchdata/sf10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "256"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Tables.load(spark, d, "documents").select($"doc_id", $"text")
    println("[d04prof] docs: " + docs.count())

    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[d04prof] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // stage 1: shingle table (persisted by the memo on first use)
    val sh = graft.operators.Dedup.shingleTable(docs, $"doc_id", $"text", 3)
    timed("shingle_build")(sh.count())
    // stage 2: minhash signatures + band self-join + distinct (d02 core)
    val cand = graft.operators.Dedup.candidatesFromShingles(sh, 16, 4)
    val nCand = timed("lsh_candidates")(cand.count())
    println("[d04prof] candidate pairs: " + nCand)
    // stage 3: the refinement join + merge-walk jaccard (d04 minus d02)
    val pairs = graft.operators.Dedup.jaccardPairs(
      docs, $"doc_id", $"text", shingleN = 3, k = 16, bands = 4, minSim = 0.3)
    val nPairs = timed("jaccard_refinement")(pairs.count())
    println("[d04prof] surviving pairs@0.3: " + nPairs)
    spark.stop()
  }
}
