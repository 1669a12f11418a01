package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and scrubbing for text corpora — the redaction pass a
  * training-data pipeline runs before anything else sees the text.
  *
  * Patterns are deliberately restricted to the regex subset Java
  * (Spark) and RE2 (DuckDB, Go tooling) interpret identically: no
  * backreferences, no lookaround, no possessive quantifiers — so the
  * same pattern literals drive both the engine and the oracle, and a
  * port to another scrubber can't silently diverge.
  *
  * Scale shape: every function is a per-row codegen'd expression
  * (`regexp_extract_all` / `regexp_replace` from `functions._`) — no
  * UDFs, no shuffle, embarrassingly parallel over the corpus scan.
  */
object PiiFunctions {

  /** Email addresses (practical form, lowercase corpus). */
  val emailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** North-American-style phone numbers `555-123-4567`. */
  val phonePattern = "\\d{3}-\\d{3}-\\d{4}"

  /** Dotted-quad IPv4 literals. */
  val ipPattern = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"

  private def countMatches(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  def emailCount(c: Column): Column = countMatches(c, emailPattern)
  def phoneCount(c: Column): Column = countMatches(c, phonePattern)
  def ipCount(c: Column): Column = countMatches(c, ipPattern)

  /** Redact in fixed order — email first (it can contain dotted/digit
    * runs the narrower patterns would partially eat), then IP, then
    * phone. Replacement tokens keep the text trainable while marking
    * the redaction class. */
  def scrub(c: Column): Column = {
    val noEmail = regexp_replace(c, emailPattern, "[EMAIL]")
    val noIp = regexp_replace(noEmail, ipPattern, "[IP]")
    regexp_replace(noIp, phonePattern, "[PHONE]")
  }

  /** Struct of all detection counts + a has_pii flag, one scan. */
  def piiStruct(c: Column): Column =
    struct(
      emailCount(c).as("n_emails"),
      phoneCount(c).as("n_phones"),
      ipCount(c).as("n_ips"),
      (emailCount(c) + phoneCount(c) + ipCount(c) > 0).as("has_pii"),
    )
}
