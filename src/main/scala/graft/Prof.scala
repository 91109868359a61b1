package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = "/root/testdata/sf0.1"
    def t[A](n: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$n%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s")
    }
    val docs = Tables.load(spark, d, "documents")
    t("warmup")(docs.count())
    val sh = operators.Dedup.shingleTable(docs, $"doc_id", $"text", 3)
    t("shingleTable fill")(sh.count())
    val keys = operators.Dedup.lshKeysFromShingles(sh, 16, 4)
    t("lshKeys (minhash)")(keys.count())
    t("candidates")(operators.Dedup.candidatesFromShingles(sh, 16, 4).count())
    t("jaccard full")(operators.Dedup.jaccardPairs(docs, $"doc_id", $"text").count())
    spark.stop()
  }
}
