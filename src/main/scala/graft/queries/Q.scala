package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator exposure: a Spark DataFrame program plus (when
  * SQL-expressible) a DuckDB oracle computing the identical result on the
  * same parquet tables. Column names/aliases MUST match pairwise — the
  * driver sorts columns by name before hashing (builder contract).
  *
  * Determinism rules applied throughout:
  *  - doubles are `round(x, n)`-ed on BOTH sides (parallel summation order
  *    differs from DuckDB's sequential sum only below the rounding grain);
  *  - top-k always carries a unique tie-breaker key in the sort;
  *  - oracle aggregates over INTEGER are cast to BIGINT (DuckDB widens to
  *    HUGEINT where Spark uses LongType).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QuerySet {
  def all: Seq[Q]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap
  final def oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
