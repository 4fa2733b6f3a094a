package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Core string/term normalization column functions.
  *
  * Semantics mirror the reference pipeline (all cites into
  * /root/reference/): normalize_term (xml_to_json.py:7-14,
  * json_classification.py:70-77), parenthetical strip
  * (xml_to_json.py:34-36), URI minting (generate_uri.py:5-26) —
  * re-expressed as codegen'd Spark built-ins so they stay inside
  * whole-stage codegen (no UDF on the hot path).
  */
object Text {

  /** Whitespace-collapse + trim + lowercase (reference `normalize_term`). */
  def normTerm(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Drop non-greedy `(...)` content then trim (xml_to_json.py:34-36). */
  def stripParens(c: Column): Column =
    trim(regexp_replace(c, "\\(.*?\\)", ""))

  /** Deterministic entity URI (generate_uri.py:5-26):
    * 'r' + str(int(sha256(lower(s) minus spaces/commas).hexdigest()[:8], 16) % 1e8).
    * First 8 hex chars fit in 32 bits, so the Long cast is safe.
    */
  def uriHash(c: Column): Column =
    concat(
      lit("r"),
      pmod(
        conv(substring(sha2(regexp_replace(lower(c), "[ ,]", ""), 256), 1, 8), 16, 10)
          .cast("long"),
        lit(100000000L)
      ).cast("string")
    )

  /** Whitespace tokenization used by the text-analysis operators. */
  def tokens(c: Column): Column = split(c, "\\s+")

  /** n-token shingles of a token-array column (empty when under n).
    * The size guard is load-bearing: `sequence(0, -1)` yields a
    * DESCENDING [0, -1] (default step -1), not an empty array.
    */
  def shingles(ts: Column, n: Int): Column =
    when(size(ts) >= n,
      transform(sequence(lit(0), size(ts) - n),
        i => concat_ws(" ", (0 until n).map(j => get(ts, i + lit(j))): _*)))
      .otherwise(array().cast("array<string>"))

  /** Document fingerprint: first 16 hex chars of md5 of the normalized text.
    * (North-star text analysis; md5 is available and identical in DuckDB
    * for oracle parity.)
    */
  def fingerprint(c: Column): Column = substring(md5(normTerm(c)), 1, 16)

  /** 32-bit hash derived from md5 — engine-portable (same value in any
    * engine with md5), used for deterministic bucketing/minhash seeds
    * instead of Spark-private murmur3.
    */
  def md5Hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Email-shaped token pattern — shared Java/RE2 syntax (no capture
    * groups, no backtracking constructs) so Spark and DuckDB match the
    * identical spans.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** PII redaction: email-shaped tokens then digit runs replaced with
    * typed placeholders. Emails are masked FIRST so their digits are
    * not split by the number pass.
    */
  def maskPii(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailRe, "<EMAIL>"), "[0-9]+", "<NUM>")
}
