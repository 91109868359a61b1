package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof {
  def main(args: Array[String]): Unit = {
    // Prof [sfDir] — with an explicit sfDir only the dedup-stage
    // profile runs (SPARK_GRAFT_SHUFFLE sizes the shuffle like the
    // scale probes); with none, the full sf0.1 profile + compaction
    // throughput sections run.
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE","32"))
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    if (args.nonEmpty) { spark.stop(); return }

    // compaction throughput on a generated small-file lake (the
    // reference's headline workload): n files of ~2 KB each -> 1 MB
    // parquet bundles. Prints wall so files/s and MB/s can be derived.
    {
      implicit val s = spark
      val n = 20000
      val lake = java.nio.file.Files.createTempDirectory("prof_lake")
      val out = java.nio.file.Files.createTempDirectory("prof_lake_out")
      val pad = "x" * 2000
      (1 to n).foreach { i =>
        java.nio.file.Files.write(lake.resolve(s"f$i.json"),
          s"""{"i":$i,"pad":"$pad"}""".getBytes("UTF-8"))
      }
      val files = spark.read.format("binaryFile").load(lake.toString)
      val listing = files.select($"path", $"modificationTime", $"length")
        .filter($"length" > 0)
      t(s"listing-only count $n")(listing.count())
      val assign = operators.Compactor.withBundleId(listing,
        $"modificationTime", Seq($"path"), $"length", 1L << 20)
      t(s"assignment (3 phases) $n")(assign.count())
      t(s"raw content write $n")(
        files.select($"path", $"content")
          .write.mode("overwrite").parquet(out.toString + "_raw"))
      t(s"join, no partitionBy $n")(
        files.select($"path", $"content").join(assign, "path")
          .write.mode("overwrite").parquet(out.toString + "_nopart"))
      t(s"content join+write $n")(
        files.select($"path", $"content").join(assign, "path")
          .repartition(col(operators.Compactor.BundleCol))
          .write.mode("overwrite").partitionBy(operators.Compactor.BundleCol)
          .parquet(out.toString))
      t(s"manifest $n")(
        operators.Compactor.manifest(assign, $"path").count())
      t(s"compactDirectory $n x 2KB")(
        operators.Compactor.compactDirectory(
          lake.toString, out.toString, 1L << 20).count())
    }

    // gzip-bundle throughput at 1 GB (5000 x 200 KB of word-salad JSON,
    // the compressed-lake setting the reference's gzip handler targets;
    // 16 MB bundles). Single-node reference measured 41 s here (24 MB/s,
    // one core of zlib); 32-way parallel gzip is the win to demonstrate.
    {
      implicit val s = spark
      val n = 5000
      val lake = java.nio.file.Files.createTempDirectory("prof_gz_lake")
      val out = java.nio.file.Files.createTempDirectory("prof_gz_out")
      val words = Array("alpha","beta","gamma","delta","epsilon","zeta","eta","theta")
      val rng = new scala.util.Random(42)
      val body = Array.fill(40000)(words(rng.nextInt(words.length))).mkString(" ")
      (1 to n).foreach { i =>
        java.nio.file.Files.write(lake.resolve(s"f$i.json"),
          s"""{"i":$i,"body":"$body"}""".getBytes("UTF-8"))
      }
      t(s"compactToText gzip $n x 200KB (1 GB)")(
        operators.Compactor.compactToText(
          lake.toString, out.toString, 16L << 20, Some("gzip")).count())
    }
    spark.stop()
  }
}
