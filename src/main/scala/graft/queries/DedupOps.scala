package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Deduplication operators (north-star contract): exact first; the
  * MinHash/SimHash/Jaccard/embedding family follows in
  * [[graft.operators.Dedup]].
  */
object DedupOps extends QuerySet {

  val all: Seq[Q] = Seq(

    // --- Exact dedup: keep the first record per key in (ts, id) order.
    // Hash-shuffle on the key, one window pass — at scale this is the
    // standard `row_number()=1` pattern (no driver collect, skew handled
    // by AQE).
    Q("d01_exact_dedup",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id", $"event_type")
          .orderBy($"ts_ns".asc, $"event_id".asc)
        Tables.load(s, d, "events")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"user_id", $"event_type", $"event_id".as("first_event_id"))
      },
      Some("""SELECT user_id, event_type, event_id AS first_event_id
             |FROM (SELECT user_id, event_type, event_id,
             |  row_number() OVER (PARTITION BY user_id, event_type
             |                     ORDER BY ts, event_id) AS rn
             |  FROM events) WHERE rn = 1""".stripMargin))
  )
}
