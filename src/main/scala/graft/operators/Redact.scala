package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scan + redaction over string columns — the standard pre-training
  * anonymization pass (emails / phone numbers / SSN-shaped ids / IPv4),
  * extending §2.11 curation beyond the reference's surface (lakeflush
  * has no scrub pass; a corpus pipeline needs one before anything
  * ships to training).
  *
  * Design rules:
  *  - Patterns are RE2-compatible (no lookarounds, no backreferences)
  *    so the SAME rule list runs verbatim under Spark's java.util.regex
  *    and the DuckDB oracle's RE2 — the t17 oracle pins byte-identical
  *    redacted output across both engines.
  *  - Rules apply in DECLARED ORDER on the evolving text; counts are
  *    measured per-rule on the ORIGINAL text. Ordering is part of the
  *    contract (a later rule never sees spans an earlier rule replaced).
  *  - Everything is built-in `regexp_count` / `regexp_replace` —
  *    per-row, codegen'd, zero shuffle. At 100 TB this pass is
  *    scan-bound and embarrassingly parallel; it composes with the
  *    cleaning pipelines (p01/p02) as just another projection.
  */
object Redact {

  /** One scan/redact rule. `pattern` must be RE2-safe (see above). */
  final case class Rule(name: String, pattern: String, replacement: String)

  /** Default pre-training scrub, ordered most- to least-specific so the
    * structurally-disjoint shapes (3-2-4 SSN vs 3-3-4 phone vs dotted
    * quads) never race: email, SSN, phone, IPv4.
    */
  val defaultRules: Seq[Rule] = Seq(
    Rule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    Rule("ssn",   "\\b\\d{3}-\\d{2}-\\d{4}\\b",                      "<SSN>"),
    Rule("phone", "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b",              "<PHONE>"),
    Rule("ipv4",  "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b",                  "<IPV4>"))

  /** Per-rule match count over the ORIGINAL text (LongType). */
  def counts(text: Column, rules: Seq[Rule] = defaultRules): Seq[(String, Column)] =
    rules.map(r => r.name -> regexp_count(text, lit(r.pattern)).cast("long"))

  /** Text with every rule applied in declared order. */
  def redact(text: Column, rules: Seq[Rule] = defaultRules): Column =
    rules.foldLeft(text)((c, r) => regexp_replace(c, r.pattern, r.replacement))
}
