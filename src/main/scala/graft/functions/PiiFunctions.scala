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

  /** Candidate payment-card numbers: 16-digit runs on word
    * boundaries (\b is in the Java∩RE2 subset). Candidates are then
    * CHECKSUM-validated with [[luhnValid]] — digit-run matching alone
    * drowns in false positives (ids, timestamps, hashes); the Luhn
    * pass is what separates "looks like a card" from "is a card". */
  val cardPattern = "\\b\\d{16}\\b"

  /** Luhn checksum (ISO/IEC 7812) as a pure integer Column
    * expression, length-generic: from the rightmost digit, double
    * every second digit, fold digits >9 back by −9, valid iff the
    * total is ≡ 0 (mod 10). Per-character substr + small-int
    * arithmetic inside one HOF fold — cheap per element (the
    * nested-expensive-expression HOF rule targets recomputed heavy
    * subtrees, not single-char math). */
  def luhnValid(card: Column): Column = {
    val len = length(card)
    val total = aggregate(
      sequence(lit(0), len - 1),
      lit(0),
      (acc, i) => {
        // ascii arithmetic, not cast: ANSI mode makes cast('x' as int)
        // THROW; a non-digit must poison the fold to NULL instead
        val ch = card.substr(i + lit(1), lit(1))
        val d = when(ch >= "0" && ch <= "9", ascii(ch) - 48)
          .otherwise(lit(null).cast("int"))
        // position from the right r = len - i; double when r is even
        val dd = when(((len - i) % 2) === 0, d * 2).otherwise(d)
        acc + when(dd > 9, dd - 9).otherwise(dd)
      })
    // TOTAL function, never NULL: a non-digit character NULL-poisons
    // the fold (substr.cast -> NULL) and empty/NULL input has no
    // checksum — all of those are "not a valid card", not unknown
    // (three-valued logic would silently misroute a NOT filter)
    coalesce((len > 0) && ((total % 10) === 0), lit(false))
  }

  /** The Luhn-valid card numbers present in the text. */
  def validCards(c: Column): Column =
    filter(regexp_extract_all(c, lit(cardPattern), lit(0)), luhnValid(_))

  def cardCandidateCount(c: Column): Column =
    size(regexp_extract_all(c, lit(cardPattern), lit(0)))
  def cardCount(c: Column): Column = size(validCards(c))

  /** Redact exactly the Luhn-VALID card numbers: a regex replace
    * cannot condition on the checksum, so the valid candidates are
    * folded over the text with literal replaces — candidate counts
    * are tiny per row, and an invalid digit run (an id, a hash) is
    * deliberately left untouched. */
  def scrubCards(c: Column): Column =
    aggregate(validCards(c), c, (acc, card) => replace(acc, card, lit("[CARD]")))

  /** One-scan struct of (n_cards, n_valid, scrubbed) — the piiStruct
    * discipline: HOFs are excluded from codegen subexpression
    * elimination, so composing [[cardCount]] + [[scrubCards]] in one
    * projection re-runs the candidate regex and the per-candidate
    * Luhn fold per consumer; here ONE fold carries a (count,
    * scrubbed-text) struct accumulator, validating each candidate
    * exactly once. */
  def cardStruct(c: Column): Column = {
    val cards = regexp_extract_all(c, lit(cardPattern), lit(0))
    // the finish lambda builds the OUTPUT struct inside the one
    // aggregate, so the fold tree appears exactly once in the plan
    // (two getField consumers of a shared val would duplicate it —
    // HOFs are excluded from subexpression elimination). luhnValid
    // is referenced twice inside the merge lambda; that recompute is
    // a bounded 16-digit scan per candidate, not the cross-consumer
    // full-pipeline recompute the HOF rule targets.
    aggregate(cards,
      struct(lit(0L).as("n_valid"), c.as("scrubbed")),
      (acc, card) => {
        val valid = luhnValid(card)
        struct(
          (acc.getField("n_valid") + when(valid, 1L).otherwise(0L)).as("n_valid"),
          when(valid, replace(acc.getField("scrubbed"), card, lit("[CARD]")))
            .otherwise(acc.getField("scrubbed")).as("scrubbed"))
      },
      acc => struct(size(cards).cast("long").as("n_cards"),
        acc.getField("n_valid").as("n_valid"),
        acc.getField("scrubbed").as("scrubbed")))
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
