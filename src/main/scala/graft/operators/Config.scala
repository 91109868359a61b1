package graft.operators

/** Validated operator configs (reference O4: constructor precondition
  * matrix — `core/collector.py:35-45`, `core/flusher.py:23-27`,
  * `collectors/local_lake.py:43-52`). `require` at construction, so a
  * bad config fails on the driver before any job launches.
  */
final case class CompactionConfig(
    inputDir: String,
    outputDir: String,
    targetBytes: Long,
    glob: Option[String] = None,
    codec: Option[String] = None) {
  require(inputDir.nonEmpty, "inputDir must be non-empty")
  require(outputDir.nonEmpty, "outputDir must be non-empty")
  require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
  require(codec.forall(Set("gzip", "bzip2", "deflate", "snappy", "none")),
    s"unsupported codec: ${codec.get}")
}

/** S3 deployment readiness surface (S2/K3). The sandbox has no live S3,
  * so these knobs are proven over the `graftfs://` foreign-scheme tests
  * (SchemeSpec) — the mapping below is what a real deployment flips,
  * with each reference behavior's S3A equivalent:
  *
  * | Reference behavior | S3A key set here |
  * |---|---|
  * | `boto3.client("s3")` default credential chain (`utils/s3/store.py:15`) | `fs.s3a.aws.credentials.provider` — unset keeps S3A's own default chain (env -> profile -> instance role), exactly boto3's resolution order |
  * | `s3_batchsize` LIST page size (`utils/s3/processor.py:22,36-38`: `PaginationConfig.PageSize`) | `fs.s3a.paging.maximum` — keys per LIST page; the service caps a page at 1000, same cap boto3's paginator inherits |
  * | `upload_file` managed multipart upload (`utils/s3/store.py:46`) | `fs.s3a.committer.name` — job-level atomicity; "magic"/"partitioned" commit via multipart-complete, never rename |
  * | endpoint/region from the boto3 session environment | `fs.s3a.endpoint` + `fs.s3a.path.style.access` (non-AWS stores) |
  *
  * Scheme-parameterized so the offline tests can apply the identical
  * code path to `graftfs://` (`applyTo(spark, "graftfs")`) and assert
  * the keys land on the session's Hadoop conf that the FileSystem
  * actually reads.
  */
final case class S3Config(
    credentialsProvider: Option[String] = None,
    pagingMaximum: Int = 1000,
    committer: String = "magic",
    endpoint: Option[String] = None,
    pathStyleAccess: Boolean = false) {
  require(pagingMaximum >= 1, s"pagingMaximum must be >= 1, got $pagingMaximum")
  require(Set("magic", "directory", "partitioned", "file")(committer),
    s"unsupported committer: $committer")

  /** Set the per-scheme Hadoop keys on the session (driver-side, before
    * any job touches the store — same construction-time contract as the
    * other configs' `require`s).
    */
  def applyTo(spark: org.apache.spark.sql.SparkSession,
              scheme: String = "s3a"): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    credentialsProvider.foreach(p =>
      hc.set(s"fs.$scheme.aws.credentials.provider", p))
    hc.setInt(s"fs.$scheme.paging.maximum", pagingMaximum)
    hc.set(s"fs.$scheme.committer.name", committer)
    endpoint.foreach(e => hc.set(s"fs.$scheme.endpoint", e))
    hc.setBoolean(s"fs.$scheme.path.style.access", pathStyleAccess)
  }
}

final case class FlushConfig(
    collectedDir: String,
    destDir: String,
    checkpointDir: String,
    maxFileAge: String = "3650d") {
  require(collectedDir.nonEmpty, "collectedDir must be non-empty")
  require(destDir.nonEmpty, "destDir must be non-empty")
  require(checkpointDir.nonEmpty, "checkpointDir must be non-empty")
  require(destDir != collectedDir, "destination must differ from source")
}
