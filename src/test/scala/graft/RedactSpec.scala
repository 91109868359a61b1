package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Redact}

/** PII scan/redaction semantics on realistic payloads (the corpus query
  * t17 pins engine parity; this pins the rules themselves), plus the
  * incremental delta-vs-base dedup contract.
  */
class RedactSpec extends SparkSpec {

  private def redactOne(s: String): (String, Map[String, Long]) = {
    import spark.implicits._
    val df = Seq(s).toDF("t")
    val cols = col("t") +: Redact.redact(col("t")).as("r") +:
      Redact.counts(col("t")).map { case (n, c) => c.as(n) }
    val row = df.select(cols: _*).collect()(0)
    (row.getString(1),
     Redact.defaultRules.map(_.name).zipWithIndex
       .map { case (n, i) => n -> row.getLong(i + 2) }.toMap)
  }

  test("each default rule redacts its realistic shape") {
    val (r1, c1) = redactOne("mail jane.doe+spam@sub.example.co.uk for details")
    assert(r1 == "mail <EMAIL> for details" && c1("email") == 1L)

    val (r2, c2) = redactOne("ssn 123-45-6789 on file")
    assert(r2 == "ssn <SSN> on file" && c2("ssn") == 1L)

    val (r3, c3) = redactOne("call 415-555-0123 or 415.555.0124 or 415 555 0125")
    assert(r3 == "call <PHONE> or <PHONE> or <PHONE>" && c3("phone") == 3L)

    val (r4, c4) = redactOne("host 192.168.0.1 gateway 10.0.0.254")
    assert(r4 == "host <IPV4> gateway <IPV4>" && c4("ipv4") == 2L)
  }

  test("shapes are structurally disjoint and negatives stay untouched") {
    // a phone is not an SSN (3-3-4 vs 3-2-4) and vice versa
    val (r, c) = redactOne("ssn 123-45-6789 phone 415-555-0123")
    assert(r == "ssn <SSN> phone <PHONE>")
    assert(c("ssn") == 1L && c("phone") == 1L)
    // plain numbers, versions, short dotted tuples survive
    val neg = "port 8080 version 1.2.3 order 123456789 at 12-34"
    assert(redactOne(neg)._1 == neg)
  }

  test("redaction is idempotent and counts read the original text") {
    val s = "user1@example.com 10.0.0.1"
    val (once, counts) = redactOne(s)
    assert(once == "<EMAIL> <IPV4>")
    assert(redactOne(once)._1 == once)
    assert(counts("email") == 1L && counts("ipv4") == 1L)
  }

  test("incrementalFlags: exact wins, near refines, novel docs absent") {
    import spark.implicits._
    val common = (1 to 30).map(i => s"w$i").mkString(" ")
    val base = Seq(
      (0L, s"$common tail zero"),
      (1L, "completely different base content here"),
      (2L, s"$common tail zero")).toDF("doc_id", "text")
    val delta = Seq(
      (10L, s"$common tail zero"),        // exact dup of 0 (and 2)
      (11L, s"$common tail CHANGED"),     // near dup of 0/2, not exact
      (12L, "novel delta document nothing shared")).toDF("doc_id", "text")
    val got = Dedup.incrementalFlags(base, delta, $"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((10L, "exact", 0L), (11L, "near", 0L)))
  }
}
