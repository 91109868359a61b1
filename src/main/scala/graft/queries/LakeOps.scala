package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Compactor

/** Compaction-semantics operators (SURVEY §2.1-2.4) exposed over the
  * driver tables so the DuckDB oracle can check them. The `events` table
  * stands in for a file listing: `event_id`≈path, `ts`≈mtime,
  * `length(props)`≈size. The real file-level API (`binaryFile` scans,
  * glob filters, partitioned writes) lives in
  * [[graft.operators.Compactor]] / [[graft.operators.Readers]] and is
  * exercised by ScalaTest on generated lakes.
  */
object LakeOps extends QuerySet {

  val all: Seq[Q] = Seq(

    // --- W1 size-based rotation as a running-sum bundle assignment over
    // the mtime total order, then the K4 manifest. Distributed prefix sum
    // (see Compactor scaladoc) — the oracle states the same thing as one
    // global window, legal at oracle scale.
    Q("c01_bundle_assign",
      (s, d) => {
        import s.implicits._
        val ev = Tables.load(s, d, "events")
          .select($"event_id", $"ts_ns", length($"props").as("sz"))
        val withB = Compactor.withBundleId(
          ev, $"ts_ns", Seq($"event_id"), $"sz", targetBytes = 4096L)
        Compactor.manifest(withB, $"event_id")
      },
      Some("""WITH b AS (
             |  SELECT event_id, length(props) AS sz,
             |    CAST(floor(CAST(coalesce(sum(length(props)) OVER (
             |      ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             |      / 4096) AS BIGINT) AS bundle_id
             |  FROM events)
             |SELECT bundle_id, count(*) AS n_records,
             |  CAST(sum(sz) AS BIGINT) AS total_bytes,
             |  min(event_id) AS first_key, max(event_id) AS last_key
             |FROM b GROUP BY bundle_id""".stripMargin)),

    // --- F1 glob filter, re-expressed as a LIKE over a path-like column
    // (documents.source). Reference: fnmatch any-of, basename-only —
    // `utils/file/processor.py:38-50`.
    Q("c02_glob_filter",
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "documents")
          .filter($"source".like("src1%"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_files"),
               sum($"n_chars").as("total_chars"))
      },
      Some("""SELECT source, count(*) AS n_files,
             |CAST(sum(n_chars) AS BIGINT) AS total_chars
             |FROM documents WHERE source LIKE 'src1%'
             |GROUP BY source""".stripMargin)),

    // --- F2 empty-file skip + S1 mtime-ordered scan head: the oldest 50
    // non-empty "files" in exact (mtime, path) order. Reference order is
    // only approximate (heap per batch); we document the exact-order
    // upgrade (SURVEY §4).
    Q("c03_mtime_order",
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "events")
          .filter(length($"props") > 0)
          .orderBy($"ts_ns".asc, $"event_id".asc)
          .limit(50)
          .select($"event_id", $"user_id", $"event_type")
      },
      Some("""SELECT event_id, user_id, event_type
             |FROM events WHERE length(props) > 0
             |ORDER BY ts ASC, event_id ASC LIMIT 50""".stripMargin)),

    // --- Z-ORDER clustering key (r12, Compactor.zorderParquet's
    // ordering column): the Morton interleave of two 12-bit dimension
    // ids, pinned against an INDEPENDENT SQL reconstruction — DuckDB
    // rebuilds every output bit with shift/mask arithmetic, so the
    // native ZValue kernel is oracle-checked, not just spec-checked.
    // Dimensions here are deterministic int images of the event stream
    // (user bucket, second-of-day bucket) — the bucketing a real
    // OPTIMIZE derives from quantiles, fixed so the oracle is exact.
    Q("c04_zorder_key",
      (s, d) => {
        import s.implicits._
        import graft.expressions.NativeFns.z_value
        val ev = Tables.load(s, d, "events")
        val x = ($"user_id" % 4096).cast("int")
        // integer DIV, not `/`: epoch-ns longs sit above 2^53, where
        // double division rounds by ~256 ns — a value within half an
        // ulp of a second boundary would bucket differently than
        // DuckDB's exact `//` and flake the gate
        val y = (expr("ts_ns DIV 1000000000") % 4096).cast("int")
        ev.select($"event_id", x.as("x"), y.as("y"),
            z_value(array(x, y), 12).as("z"))
          .orderBy($"z".asc, $"event_id".asc)
          .limit(200)
      },
      Some {
        val terms = (0 until 12).flatMap(b => Seq(
          s"(((x >> $b) & 1) << ${2 * b})",
          s"(((y >> $b) & 1) << ${2 * b + 1})"))
        s"""WITH d AS (SELECT event_id,
           |  CAST(user_id % 4096 AS INTEGER) AS x,
           |  CAST((epoch_ns(ts) // 1000000000) % 4096 AS INTEGER) AS y
           |  FROM events)
           |SELECT event_id, x, y,
           |  CAST(${terms.mkString(" | ")} AS BIGINT) AS z
           |FROM d ORDER BY z ASC, event_id ASC LIMIT 200""".stripMargin
      })
  )
}
