package graft

import java.net.URI
import java.nio.file.{Files, Paths}
import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.{Compactor, Readers}

/** Local filesystem registered under a NON-`file:` scheme. */
class GraftTestFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("graftfs:///")
}

/** S2/K3 coverage without cloud credentials: every path in the engine
  * flows through the Hadoop FileSystem API, so the s3a:// story is
  * "same code path, different scheme" — this spec PROVES the
  * scheme-independence by running read, glob, compaction, and the
  * partitioned streaming sink over `graftfs://`, a RawLocalFileSystem
  * registered under a foreign scheme. Catches exactly the bug family a
  * URI swap exposes: glob applied to keys vs basenames, `new File`
  * escapes, scheme-dropping path roundtrips, listing asymmetries.
  */
class SchemeSpec extends SparkSpec {

  private def reg(): Unit =
    spark.sparkContext.hadoopConfiguration.set(
      "fs.graftfs.impl", classOf[GraftTestFileSystem].getName)

  test("whole-text read + glob + mtime order work on a foreign scheme") {
    reg()
    val dir = tmpDir("scheme_in")
    (1 to 6).foreach { i =>
      val p = Paths.get(dir.toString, s"r$i.json")
      Files.write(p, s"""{"i":$i}""".getBytes("UTF-8"))
      p.toFile.setLastModified(1700000000000L + i * 1000L)
    }
    Files.write(Paths.get(dir.toString, "skip.txt"), "no".getBytes("UTF-8"))

    val got = Readers.wholeTextRecords(spark, s"graftfs://$dir",
      glob = Some("*.json"))
    val rows = got.orderBy("mtime").collect()
    assert(rows.length == 6, "glob must match basenames, not full keys")
    // paths come back ON the foreign scheme, in mtime order
    assert(rows.forall(_.getAs[String]("path").startsWith("graftfs:/")))
    assert(rows.map(_.getAs[String]("content")).toSeq ==
      (1 to 6).map(i => s"""{"i":$i}"""))
  }

  test("glob matches BASENAMES on every scheme, nested layouts included (F1 decision)") {
    // The reference is asymmetric: local glob matches the basename
    // (utils/file/processor.py:38-50) but S3 glob matches the full
    // object KEY (utils/s3/processor.py:45-56) — so `a*.json` finds
    // `x/a1.json` locally and finds NOTHING on S3. The engine
    // normalizes to basename matching everywhere (Spark's
    // pathGlobFilter): a filter means the same thing when a lake moves
    // between schemes. This test pins that choice on a foreign scheme
    // over a nested layout so the asymmetry can't regress unnoticed.
    reg()
    val dir = tmpDir("scheme_glob_in")
    def put(rel: String, body: String): Unit = {
      val p = Paths.get(dir.toString, rel)
      Files.createDirectories(p.getParent)
      Files.write(p, body.getBytes("UTF-8"))
      p.toFile.setLastModified(1700000000000L + rel.length * 1000L)
    }
    put("x/a1.json", """{"i":1}""")
    put("y/a2.json", """{"i":2}""")
    put("y/b3.json", """{"i":3}""")
    put("y/a4.txt", "not json")

    def names(root: String) =
      Readers.wholeTextRecords(spark, root, glob = Some("a*.json"))
        .collect().map(_.getAs[String]("path").split('/').last).toSet
    // nested dirs reached via a path wildcard; the glob FILTER itself
    // sees basenames — full-key matching would return an empty set here
    val viaScheme = names(s"graftfs://$dir/*")
    assert(viaScheme == Set("a1.json", "a2.json"),
      s"basename glob semantics violated: $viaScheme")
    // identical semantics on file: — no scheme asymmetry
    assert(names(s"$dir/*") == viaScheme)
  }

  test("compaction in and out of a foreign scheme equals the file: run") {
    implicit val s = spark
    reg()
    val in = tmpDir("scheme_c_in")
    (1 to 20).foreach { i =>
      val p = Paths.get(in.toString, f"p$i%02d.json")
      Files.write(p, (s"""{"i":$i,"pad":"${"x" * (i % 17)}"}""").getBytes("UTF-8"))
      p.toFile.setLastModified(1700000000000L + i * 500L)
    }
    val outA = tmpDir("scheme_c_outA"); val outB = tmpDir("scheme_c_outB")
    val viaScheme = Compactor.compactDirectory(
      s"graftfs://$in", s"graftfs://$outA", targetBytes = 200L)
    val viaFile = Compactor.compactDirectory(
      in.toString, outB.toString, targetBytes = 200L)
    def shape(mf: org.apache.spark.sql.DataFrame) =
      mf.select("bundle_id", "n_records", "total_bytes").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(shape(viaScheme) == shape(viaFile))
    // bundles written through graftfs are real files readable via file:
    val back = spark.read.parquet(outA.toString)
    assert(back.count() == 20)
  }

  test("S3Config readiness surface lands on the scheme's Hadoop conf (S2/K3 knobs)") {
    implicit val s = spark
    reg()
    // the knobs a real s3a:// deployment flips, applied to the foreign
    // scheme the sandbox CAN exercise — same code path, different scheme
    graft.operators.S3Config(
      credentialsProvider = Some("org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"),
      pagingMaximum = 500, // reference s3_batchsize analog
      committer = "partitioned",
      endpoint = Some("https://store.example:9000"),
      pathStyleAccess = true).applyTo(spark, scheme = "graftfs")
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.graftfs.aws.credentials.provider")
      == "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider")
    assert(hc.getInt("fs.graftfs.paging.maximum", -1) == 500)
    assert(hc.get("fs.graftfs.committer.name") == "partitioned")
    assert(hc.get("fs.graftfs.endpoint") == "https://store.example:9000")
    assert(hc.getBoolean("fs.graftfs.path.style.access", false))
    // the configured scheme still serves the whole compaction path
    val in = tmpDir("scheme_s3cfg_in")
    (1 to 5).foreach { i =>
      val p = Paths.get(in.toString, s"c$i.json")
      Files.write(p, s"""{"i":$i}""".getBytes("UTF-8"))
      p.toFile.setLastModified(1700000000000L + i * 1000L)
    }
    val out = tmpDir("scheme_s3cfg_out")
    val mf = Compactor.compactDirectory(
      s"graftfs://$in", s"graftfs://$out", targetBytes = 64L)
    assert(mf.count() > 0)
    assert(spark.read.parquet(out.toString).count() == 5)
    // construction-time validation, same contract as the other configs
    intercept[IllegalArgumentException] {
      graft.operators.S3Config(committer = "rename-everything")
    }
    intercept[IllegalArgumentException] {
      graft.operators.S3Config(pagingMaximum = 0)
    }
  }

  test("partitioned streaming sink ships bundles on a foreign scheme (K3 path)") {
    reg()
    val collected = tmpDir("scheme_f_in"); val dest = tmpDir("scheme_f_out")
    val ckpt = tmpDir("scheme_f_ckpt")
    (1 to 3).foreach { i =>
      val p = Paths.get(collected.toString, s"b$i.collected")
      Files.write(p, s"payload-$i\n".getBytes("UTF-8"))
      p.toFile.setLastModified(1700000000000L)
    }
    val q = graft.streaming.FlushStream.flushToPartitionedLake(
      spark, s"graftfs://$collected", s"graftfs://$dest",
      s"graftfs://$ckpt", Trigger.AvailableNow())
    q.awaitTermination(120000)
    val out = spark.read.parquet(dest.toString)
    assert(out.count() == 3)
    assert(out.columns.contains("year"))
    // restart on the graftfs checkpoint: exactly-once holds across schemes
    val q2 = graft.streaming.FlushStream.flushToPartitionedLake(
      spark, s"graftfs://$collected", s"graftfs://$dest",
      s"graftfs://$ckpt", Trigger.AvailableNow())
    q2.awaitTermination(120000)
    assert(spark.read.parquet(dest.toString).count() == 3)
  }
}
