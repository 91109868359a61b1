package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for suites (one per suite via lazy val). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // managed tables (bucketing tests) land in tmp, not the repo
    .config("spark.sql.warehouse.dir",
      s"/tmp/graft-warehouse-${ProcessHandle.current().pid()}")
    .getOrCreate()

  def tmpDir(prefix: String): java.io.File = {
    val f = java.nio.file.Files.createTempDirectory(prefix).toFile
    f.deleteOnExit(); f
  }

  val sf0001 = "/root/testdata/sf0.001"
}
