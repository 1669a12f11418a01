package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis columns for LLM-data-pipeline work.
  *
  * All built from `org.apache.spark.sql.functions` so they stay inside
  * whole-stage codegen and are expressible as equivalent ANSI SQL for
  * the DuckDB oracle. Occurrence counting deliberately uses
  * `replace`-length arithmetic instead of regex so the semantics are
  * identical across engines (Java regex vs RE2 dialects).
  */
object TextFunctions {

  /** Lowercase, collapse whitespace, trim — canonical text form. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(c: Column): Column = split(normText(c), " ")

  /** Token count (BPE-ish subword estimate = ceil(chars/4) is provided
    * separately as [[subwordEstimate]]). */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** Rough BPE token estimate: chars/4, the usual heuristic. */
  def subwordEstimate(c: Column): Column = ceil(length(c) / lit(4.0))

  /** Non-overlapping occurrences of `word` as a standalone token.
    * Plain (non-regex) replace so the arithmetic is engine-identical:
    * replacing " word " with " " eats len(word)+1 chars per hit and
    * re-exposes the shared space for adjacent repeats. */
  def wordOccurrences(c: Column, word: String): Column = {
    val padded = concat(lit(" "), normText(c), lit(" "))
    val needle = s" $word "
    // each replacement " word " -> " " removes len(word)+1 chars
    ((length(padded) - length(call_function("replace", padded, lit(needle), lit(" "))))
      / lit(needle.length - 1)).cast("int")
  }

  /** Punctuation count without regex-dialect risk: translate() drop. */
  def punctCount(c: Column): Column =
    length(c) - length(translate(c, ".,;:!?'\"()-", ""))

  /** Language marker words, per language, priority order for argmax
    * tie-breaking. Deterministic heuristic — a real system would swap
    * in fastText; the Spark plumbing is identical. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "une"),
    "es" -> Seq("el", "los", "las", "y", "una"),
  )

  def langScore(c: Column, markers: Seq[String]): Column =
    markers.map(w => wordOccurrences(c, w)).reduce(_ + _)

  /** n-gram-heuristic language ID: argmax of marker-word counts with
    * fixed priority tie-breaking; "und" (undetermined) when no marker
    * hits at all. */
  def langId(c: Column): Column = {
    val scores = langMarkers.map { case (lang, ws) => lang -> langScore(c, ws) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), elseC) =>
      when(s === best && best > 0, lit(lang)).otherwise(elseC)
    }
  }

  /** Quality signals: length, token count, mean token length,
    * punctuation ratio, stopword ratio (en), and a composite score.
    * Ratios rounded so float compare is stable across engines. */
  def qualityStruct(c: Column): Column = {
    val n = normText(c)
    val toks = tokenCount(c)
    val punct = punctCount(c)
    val stop = langScore(c, langMarkers.head._2)
    val meanTokLen = round((length(n) - (toks - 1)).cast("double") / toks, 4)
    val punctRatio = round(punct.cast("double") / greatest(length(c), lit(1)), 6)
    val stopRatio = round(stop.cast("double") / greatest(toks, lit(1)), 6)
    struct(
      length(c).as("n_chars"),
      toks.as("n_tokens"),
      meanTokLen.as("mean_token_len"),
      punctRatio.as("punct_ratio"),
      stopRatio.as("stopword_ratio"),
    )
  }

  /** Normalized-content fingerprint — stable doc identity for exact
    * dedup and provenance (md5 = same function name + output in
    * DuckDB). */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** Duplicate-n-gram fraction (the Gopher/C4-style within-doc
    * repetition signal): 1 - distinct(kgrams)/kgrams. 0 = no repeated
    * k-gram, → 1 for highly templated/looped text. Uses the native
    * [[shingles]] pass; rounded 6dp for cross-engine stability. */
  def repetitionRatio(c: Column, k: Int = 3): Column = {
    val sh = shingles(c, k)
    round(lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh), 6)
  }

  /** Word k-shingles of the normalized text (for MinHash / Jaccard
    * verify). Native one-pass expression; bit-identical to the
    * composable `transform(idx, i => concat_ws(" ", slice(tokens,
    * i+1, k)))` form (pinned by spec), which evaluates interpreted
    * lambdas per shingle. */
  def shingles(c: Column, k: Int): Column =
    TextExpressions.stringShingles(normText(c), k)

  /** HTML → text extraction (the CCNet/RefinedWeb-style boilerplate
    * strip that precedes every quality/dedup pass on web crawl):
    * drop <script>/<style> subtrees wholesale (their CONTENT is
    * boilerplate, not prose), strip remaining tags, decode the core
    * entities (&amp; decoded LAST — single-pass rule, so "&amp;lt;"
    * yields the literal "&lt;" and never double-decodes), collapse
    * whitespace. Map-side codegen'd regexp/replace chain — patterns
    * chosen to evaluate identically under Java regex (Spark) and RE2
    * (DuckDB): character classes + lazy quantifiers only, no
    * backreferences or lookaround, so the gate can hash-compare
    * against a DuckDB twin. Not a full HTML5 parser (malformed
    * markup degrades to tag-stripping — the right failure mode for
    * corpus prep). */
  def stripHtml(c: Column): Column = {
    val noBlocks = regexp_replace(c, "(?is)<(?:script|style)[^>]*>.*?</(?:script|style)>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (ent, ch)) => replace(acc, lit(ent), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Unicode script ranges for [[scriptCounts]] — the `\x{...}` class
    * syntax is in the Java∩RE2 subset, so the same literals drive
    * Spark and the DuckDB oracle. Deliberately the big contiguous
    * base blocks (no supplements/extensions): corpus-prep script
    * profiling needs the dominant-script signal, not a full UCD. */
  val scriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z]",
    "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
    "greek" -> "[\\x{0370}-\\x{03FF}]",
    "arabic" -> "[\\x{0600}-\\x{06FF}]",
    "cjk" -> "[\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}\\x{AC00}-\\x{D7AF}]",
    "digit" -> "[0-9]")

  /** Per-script character counts + the dominant script — the
    * multilingual-corpus composition probe (mixed-script spam,
    * mojibake, and wrong-langid docs all show up as script
    * anomalies; langId covers Latin-alphabet languages only).
    * Counts are exact integers (regexp_extract_all size per class,
    * one codegen'd per-row expression each, no shuffle); dominant =
    * argmax with first-listed tie-break, "none" when every class is
    * empty (whitespace/punctuation-only text). */
  def scriptCounts(c: Column): Column = {
    val counts = scriptRanges.map { case (name, cls) =>
      name -> size(regexp_extract_all(c, lit(cls), lit(0)))
    }
    val best = counts.tail.foldLeft(
      struct(counts.head._2.as("n"), lit(counts.head._1).as("s"))) {
      case (acc, (name, cnt)) =>
        // strict > keeps the earlier script on ties
        when(cnt > acc.getField("n"), struct(cnt.as("n"), lit(name).as("s")))
          .otherwise(acc)
    }
    struct(
      counts.map { case (name, cnt) => cnt.as(s"n_$name") } :+
        when(best.getField("n") > 0, best.getField("s")).otherwise(lit("none"))
          .as("main_script"): _*)
  }
}
