package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (see TESTDATA.md /
  * FIXTURES.md §B). Every `SparkEntry.queries` entry receives the sf
  * directory and resolves tables through here so the scan is a plain
  * parquet `FileSourceScan` with pushdown/pruning intact.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables whose consumers are expression-bound (tokenization, hashing,
    * vector math) rather than scan-bound. They ship as ONE parquet split
    * at test scale, which would pin every downstream computation to a
    * single task — redistribute at load. At cluster scale real corpora
    * arrive in many splits and the repartition cost is noise next to
    * the per-row compute; read directly with spark.read.parquet to opt
    * out.
    */
  private val computeHeavy = Set("documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df =
      if (name == "events") loadEvents(spark, dir)
      else spark.read.parquet(s"$dir/$name.parquet")
    if (computeHeavy(name))
      df.repartition(spark.sessionState.conf.numShufflePartitions)
    else df
  }

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as a long (legacy nanosAsLong) and expose
    * BOTH `ts_ns: LONG` (exact — use for ordering, equal to DuckDB's
    * native ns-precision order) and `ts: TIMESTAMP` (µs, integer-
    * truncated exactly like DuckDB's ns->µs cast — use for date math).
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Register all tables as temp views (for spark.sql paths / tests). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
