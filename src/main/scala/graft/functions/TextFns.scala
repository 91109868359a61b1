package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline column builders. Everything here is composed from
  * codegen'd built-ins (`split`/`transform`/`aggregate`/`md5`) — no UDFs,
  * so whole-stage codegen stays intact and the same logic is expressible
  * in the DuckDB oracle dialect (list_transform/list_min/md5).
  *
  * Hashing convention: all pseudo-hash families derive from `md5` of a
  * salted string (`"<i>:<token>"`), which both engines implement
  * identically over UTF-8; "minimum" is lexicographic over the hex
  * digest, and "bit j" of a token hash is the high bit of hex nibble j
  * (`digest[j] >= '8'`). This keeps every operator engine-portable and
  * fully deterministic — no RNG, no seed state.
  */
object TextFns {

  /** Lowercase, strip non-alphanumerics to single spaces, trim. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Non-empty lowercase word tokens. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), w => w =!= "")

  /** Word n-gram shingles; a document shorter than n words becomes its
    * single joined shingle.
    */
  def shingles(words: Column, n: Int): Column =
    when(size(words) < n, array(concat_ws(" ", words)))
      .otherwise(transform(
        sequence(lit(1), size(words) - (n - 1)),
        i => concat_ws(" ", slice(words, i, lit(n)))))

  /** k-permutation MinHash signature: element i is the min over
    * shingles of `(A_i * x + B_i) mod (2^31-1)`, where x is the first
    * unsigned 32-bit word of md5(shingle) and A_i/B_i derive from
    * md5("perm:i") — one digest per shingle, k multiply-adds (the
    * salted-rehash family paid k digests per shingle). Dispatches to
    * the native expression ([[graft.expressions.MinHashSig]], which
    * documents the construction) — the declarative higher-order form
    * below computes the identical value via conv-on-hex but pays
    * per-element lambda interpretation.
    */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    graft.expressions.NativeFns.minhash_sig(shingleCol, k)

  /** Declarative (built-ins only) MinHash — kept as the cross-check
    * reference for the native expression; see MinHashParitySpec.
    */
  def minhashSignatureDeclarative(shingleCol: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => {
        val perm = md5(concat(lit("perm:"), i.cast("string")))
        val a = conv(substring(perm, 1, 8), 16, 10).cast("long")
          .mod(lit(graft.expressions.MinHashSig.AMod)) + lit(1L)
        val b = conv(substring(perm, 9, 8), 16, 10).cast("long")
        array_min(transform(shingleCol,
          s => (a * conv(substring(md5(s), 1, 8), 16, 10).cast("long") + b)
            .mod(lit(graft.expressions.MinHashSig.Prime))))
      })

  /** LSH banding: array of `struct(band_idx, band_hash)` where band_hash
    * is md5 over `rowsPerBand` consecutive signature elements. Explode
    * and equi-join on (band_idx, band_hash) for candidate pairs.
    */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band_idx"),
        // sig is array<long>; decimal-stringify before hashing so the
        // band key matches DuckDB's array_to_string(sig_slice, ',')
        md5(array_join(transform(
          slice(sig, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)),
          x => x.cast("string")), ","))
          .as("band_hash")))

  /** SimHash over word tokens (duplicates weighted by occurrence): bit j
    * is set iff sum over tokens of (+1 if hex digit j of md5(token) has
    * its high bit set else -1) is positive. Returns a `bits`-char
    * '0'/'1' string (hex digest limits bits to 32).
    */
  def simhashBits(words: Column, bits: Int = 32): Column =
    graft.expressions.NativeFns.simhash_bits(words, bits)

  /** Declarative SimHash (cross-check reference; one md5 per word PER
    * BIT vs the native expression's one per word).
    */
  def simhashBitsDeclarative(words: Column, bits: Int = 32): Column = {
    require(bits >= 1 && bits <= 32, "md5 hex digest supplies at most 32 nibbles")
    array_join(
      transform(sequence(lit(1), lit(bits)),
        j => when(
          aggregate(words, lit(0),
            (acc, w) => acc + when(md5(w).substr(j, lit(1)) >= "8", 1).otherwise(-1))
            > 0, "1").otherwise("0")),
      "")
  }

  /** Exact Jaccard similarity of two token/shingle arrays (set
    * semantics). Native one-pass expression; declarative reference
    * below.
    */
  def jaccardSim(a: Column, b: Column): Column =
    graft.expressions.NativeFns.jaccard_sim(a, b)

  /** Declarative Jaccard (cross-check reference). */
  def jaccardSimDeclarative(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    size(array_intersect(da, db)).cast("double") /
      size(array_union(da, db)).cast("double")
  }
}
