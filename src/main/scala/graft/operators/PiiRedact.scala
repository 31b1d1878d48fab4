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

  private def countOf(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** (idCol, n_emails, n_ips, n_phones, redacted_text). NULL text
    * counts zero everywhere and redacts to the empty string —
    * deterministic, like the sibling operators. */
  def redact(df: DataFrame, idCol: String = "doc_id",
             textCol: String = "text"): DataFrame = {
    val text = coalesce(col(textCol), lit(""))
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>")
    df.select(col(idCol),
      countOf(text, EmailRe).as("n_emails"),
      countOf(text, Ipv4Re).as("n_ips"),
      countOf(text, PhoneRe).as("n_phones"),
      redacted.as("redacted_text"))
  }
}
