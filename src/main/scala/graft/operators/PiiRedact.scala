package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction — the privacy pass every training-data
  * pipeline runs before release (extension surface, like the rest of
  * the LLM-pipeline family; the reference has no document corpus).
  *
  * Three conservative, dialect-portable patterns (no lookaround, no
  * backreferences — valid in BOTH Java regex (Spark codegen) and RE2
  * (the DuckDB oracle), which is what makes t54 FULLY SQL-oracled):
  *   - email: local@domain.tld;
  *   - IPv4: four 1-3-digit octets, word-bounded;
  *   - phone: international-ish +CC NNN-NNNN with -/space separators.
  *
  * Semantics (mirrored verbatim by the oracle and the truth-table
  * spec): per-category counts are measured on the ORIGINAL text
  * (non-overlapping leftmost matches, the shared regex contract);
  * redaction then applies sequentially email → IP → phone, replacing
  * each match with its category token. Sequential order matters only
  * across categories (an IP's digits could otherwise feed the phone
  * pattern) — the spec pins it.
  *
  * Everything is scan-stage `regexp_extract_all`/`regexp_replace`
  * column arithmetic: zero shuffle, codegen'd, 100 TB = one pass. */
object PiiRedact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PhoneRe = "\\+\\d{1,3}[- ]\\d{3}[- ]\\d{4}"

  /** Maximal contiguous 13-19-digit runs — card-number SHAPE; only
    * runs passing [[luhnValid]] count as cards (the standard checksum
    * cuts false positives on ids/timestamps by 10×). A >19-digit run
    * has no interior word boundary, so it yields NO candidate —
    * maximal-run semantics, identical in Java regex and RE2. */
  val CardRe = "\\b\\d{13,19}\\b"

  /** Luhn checksum validity (public ISO/IEC 7812 algorithm) via the
    * native [[graft.expr.GraftLuhn]] kernel: one JIT'd call per
    * regex-matched candidate. Digit-heavy corpora (code, logs, id
    * dumps) make candidates the common case, so this stays cheap on
    * the streaming curation path too. */
  def luhnValid(s: Column): Column = call_function("graft_luhn", s)

  /** Composed-Column reference for [[luhnValid]]: from the RIGHT,
    * double every second digit, subtract 9 from two-digit doubles,
    * total % 10 == 0 — evaluated as an interpreted higher-order fold.
    * Kept for the native-expression parity spec (the
    * [[graft.operators.Dedup.minHashSignatureComposed]] convention). */
  def luhnValidComposed(s: Column): Column = {
    val n = length(s)
    val total = aggregate(
      sequence(lit(1), n),
      lit(0),
      (acc, i) => {
        val d = ascii(s.substr(i, lit(1))) - lit(48)
        val doubled = d * 2
        acc + when((n - i) % 2 === 1,
          when(doubled > 9, doubled - 9).otherwise(doubled)).otherwise(d)
      })
    total % 10 === 0
  }

  private def countOf(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  private def validCards(text: Column): Column =
    filter(regexp_extract_all(text, lit(CardRe), lit(0)), s => luhnValid(s))

  /** (idCol, n_emails, n_cards, n_ips, n_phones, redacted_text). Counts
    * are measured on the ORIGINAL text; redaction applies email → card
    * → IP → phone (cards are contiguous digits, so neither the IP nor
    * the phone pass can eat a card first; a Luhn-INVALID digit run is
    * deliberately left in place — shape alone is not PII). NULL text
    * counts zero everywhere and redacts to the empty string.
    *
    * Card replacement is WORD-BOUNDED: each counted candidate is
    * replaced only where it occurs as a maximal digit run (`\b…\b`), so
    * a valid-card substring embedded in a longer (>19-digit or
    * alphanumeric) run is never spliced into a partial `<CARD>`. One
    * documented counts-vs-redaction asymmetry remains: a card-shaped
    * run forming an email's LOCAL PART (`4…1@x.com`) is counted as a
    * card on the original text but its digits are consumed by the
    * earlier `<EMAIL>` pass, so no `<CARD>` token appears for it —
    * counts answer "what PII is present", redaction proceeds
    * left-to-right by category. */
  def redact(df: DataFrame, idCol: String = "doc_id",
             textCol: String = "text"): DataFrame = {
    val text = coalesce(col(textCol), lit(""))
    val cards = validCards(text)
    // fold the Luhn-valid candidates into word-bounded regex replaces
    // (digits have no regex metacharacters, so the candidate embeds
    // verbatim) — regexp alone cannot redact conditionally on the
    // checksum, and a literal replace would splice non-candidate
    // occurrences inside longer runs
    val cardRedacted = aggregate(cards,
      regexp_replace(text, EmailRe, "<EMAIL>"),
      (acc, c) => regexp_replace(acc,
        concat(lit("\\b"), c, lit("\\b")), lit("<CARD>")))
    val redacted =
      regexp_replace(
        regexp_replace(cardRedacted, Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>")
    df.select(col(idCol),
      countOf(text, EmailRe).as("n_emails"),
      size(cards).cast("long").as("n_cards"),
      countOf(text, Ipv4Re).as("n_ips"),
      countOf(text, PhoneRe).as("n_phones"),
      redacted.as("redacted_text"))
  }
}
