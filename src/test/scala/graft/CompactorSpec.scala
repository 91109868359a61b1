package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.functions._
import graft.operators.Compactor

/** Compaction invariants (SURVEY §5 test plan): every bundle is below
  * target + one record; concatenation of bundles in order equals the
  * mtime-ordered concatenation of inputs; glob and empty-file filters
  * hold.
  */
class CompactorSpec extends SparkSpec {

  /** Write a small lake of text files with increasing mtimes. */
  def writeLake(n: Int, dir: java.io.File): Seq[(String, String)] = {
    (1 to n).map { i =>
      val name = f"f$i%03d.json"
      val body = s"""{"i":$i,"pad":"${"x" * (i * 7 % 97)}"}"""
      val p = Paths.get(dir.toString, name)
      Files.write(p, body.getBytes("UTF-8"), StandardOpenOption.CREATE)
      p.toFile.setLastModified(1700000000000L + i * 1000L)
      name -> body
    }
  }

  test("bundle size bound and manifest totals") {
    implicit val s = spark
    import s.implicits._
    val in = tmpDir("lake_in"); val out = tmpDir("lake_out")
    writeLake(60, in)
    val target = 512L
    // binaryFile's modificationTime is NON-nullable — this is the path
    // where r3's delegate codegen emitted an undeclared isNull and the
    // whole bundle-assignment projection silently ran interpreted.
    // CODEGEN_ONLY makes any such fallback a hard failure.
    val mf = withCodegenOnly {
      Compactor.compactDirectory(in.toString, out.toString, target) }
    val rows = mf.orderBy($"bundle_id").collect()
    assert(rows.nonEmpty)
    // every bundle except possibly the last stays under target + max
    // record size (the reference's overshoot-by-one-record bound)
    val maxRec = 200L
    rows.foreach(r => assert(r.getAs[Long]("total_bytes") <= target + maxRec))
    // manifest record count equals input file count
    assert(rows.map(_.getAs[Long]("n_records")).sum == 60)
  }

  test("bundled content equals mtime-ordered input concatenation") {
    implicit val s = spark
    import s.implicits._
    val in = tmpDir("lake_in2"); val out = tmpDir("lake_out2")
    val files = writeLake(40, in)
    Compactor.compactDirectory(in.toString, out.toString, 300L)
    val got = spark.read.parquet(out.toString)
      .orderBy($"bundle_id", $"modificationTime", $"path")
      .select($"content").as[Array[Byte]].collect()
      .map(new String(_, "UTF-8")).mkString("\n")
    val want = files.map(_._2).mkString("\n") // written in mtime order
    assert(got == want)
  }

  test("glob filter prunes non-matching files") {
    implicit val s = spark
    val in = tmpDir("lake_in3"); val out = tmpDir("lake_out3")
    writeLake(10, in)
    Files.write(Paths.get(in.toString, "skip.csv"), "a,b\n1,2".getBytes)
    val mf = Compactor.compactDirectory(in.toString, out.toString, 10000L,
      glob = Some("*.json"))
    assert(mf.agg(sum("n_records")).collect()(0).getLong(0) == 10)
  }

  test("empty files are skipped (F2)") {
    implicit val s = spark
    val in = tmpDir("lake_in4"); val out = tmpDir("lake_out4")
    writeLake(5, in)
    Files.write(Paths.get(in.toString, "empty.json"), Array.emptyByteArray)
    val mf = Compactor.compactDirectory(in.toString, out.toString, 10000L)
    assert(mf.agg(sum("n_records")).collect()(0).getLong(0) == 5)
  }

  test("bundle assignment is independent of bucket count") {
    import spark.implicits._
    val df = Tables.load(spark, sf0001, "events")
      .select($"event_id", $"ts_ns", length($"props").as("sz"))
    def assign(buckets: Int) =
      Compactor.withBundleId(df, $"ts_ns", Seq($"event_id"), $"sz", 2048L, buckets)
        .select($"event_id", col(Compactor.BundleCol)).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assign(1) == assign(7))
    assert(assign(7) == assign(32))
    // a 100x-scale bucket config must neither change assignment nor
    // fall out of whole-stage codegen (the old chained-when bucketOf
    // generated O(buckets) comparisons per row and blew the JIT limit)
    assert(assign(32) == assign(4096))
    withCodegenOnly {
      val wide = Compactor.withBundleId(
        df, $"ts_ns", Seq($"event_id"), $"sz", 2048L, 4096)
      wide.collect() // finalize the adaptive plan; throws on any fallback
      assert(wide.queryExecution.executedPlan.toString.linesIterator.exists(
        l => l.contains("range_bucket") && l.contains("*(")))
    }
  }
}
