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
