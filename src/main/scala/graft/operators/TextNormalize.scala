package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text normalization / encoding repair — the cleaning pass a crawl
  * corpus needs between extraction (t56) and everything downstream:
  * hash dedup, shingling, and tokenization all treat visually
  * identical strings as distinct if they differ in encoding artifacts,
  * so normalization must run FIRST or every detector under-counts.
  * The reference has no text-encoding surface (its inputs are numeric
  * channels); this is extension surface like the rest of the
  * LLM-pipeline family. Heuristics are the published cleaning family
  * (ftfy's cp1252 mojibake tables, Unicode UAX #15 NFC).
  *
  * Stages, in order (each mirrored verbatim by the t59 oracle):
  *   1. mojibake repair: literal cp1252-mojibake → original
  *      replacements from [[Repairs]] (UTF-8 bytes of a non-ASCII char
  *      mis-decoded as Windows-1252, the dominant real-world artifact);
  *      ordered so no later pattern matches text an earlier replacement
  *      created;
  *   2. control normalization: CRLF / bare CR → LF, TAB → space, then
  *      strip the remaining C0 controls + DEL;
  *   3. invisible strip: zero-width space U+200B and BOM U+FEFF
  *      removed (ZWJ/ZWNJ are KEPT — they are meaningful in emoji and
  *      Indic/Arabic scripts), NBSP → plain space;
  *   4. Unicode NFC via the native `graft_nfc` kernel (after the strip,
  *      so a removed invisible cannot block a composition);
  *   5. whitespace collapse: runs of spaces → one, spaces hugging a
  *      newline dropped, outer trim — newlines themselves are KEPT
  *      (paragraph structure feeds t58).
  *
  * Scale shape: pure scan-stage string built-ins plus one JIT'd NFC
  * call with an allocation-free already-normalized fast path — the
  * plan is FileScan → Project, zero shuffle, linear in corpus bytes. */
object TextNormalize {

  /** cp1252 mojibake repairs, applied in order. Each pattern is the
    * UTF-8 encoding of the replacement char read as Windows-1252.
    * `â€“`/`â€”` (containing `“`/`”`) run BEFORE `â€œ` → `“` so a
    * replacement output can never complete a later pattern. U+201D's
    * mojibake is omitted: its third byte 0x9D is undefined in cp1252.
    * The final pair drops the stray `Â` that cp1252-decoding plants
    * before an NBSP. Exposed so the oracle SQL builds its replace
    * chain from the SAME table. */
  val Repairs: Seq[(String, String)] = Seq(
    "â€™" -> "’", "â€“" -> "–", "â€”" -> "—", "â€œ" -> "“",
    "Ã©" -> "é", "Ã¨" -> "è", "Ã¤" -> "ä", "Ã¶" -> "ö",
    "Ã¼" -> "ü", "Ã±" -> "ñ", "Ã§" -> "ç", "Ã¡" -> "á",
    "\u00C2\u00A0" -> "\u00A0")

  /** `\x{…}` escapes parse identically in Java regex and RE2, so the
    * SAME pattern strings serve engine and oracle. */
  val ControlClass = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"
  val InvisibleClass = "[\\x{200B}\\x{FEFF}]"

  def repairMojibake(c: Column): Column =
    Repairs.foldLeft(c) { case (acc, (p, r)) => replace(acc, lit(p), lit(r)) }

  /** Diagnostic: total mojibake-pattern occurrences in the ORIGINAL
    * text (per-pattern counts on the raw input, not the partially
    * repaired intermediate — both engines define it the same way). */
  def repairCount(c: Column): Column =
    Repairs.map { case (p, _) =>
      ((length(c) - length(replace(c, lit(p), lit("")))) / p.length)
        .cast("long")
    }.reduce(_ + _)

  def normalizeControls(c: Column): Column =
    regexp_replace(
      replace(replace(replace(c,
        lit("\r\n"), lit("\n")), lit("\r"), lit("\n")), lit("\t"), lit(" ")),
      ControlClass, "")

  def stripInvisibles(c: Column): Column =
    replace(regexp_replace(c, InvisibleClass, ""), lit("\u00A0"), lit(" "))

  def collapseSpaces(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, " {2,}", " "), " *\n *", "\n"))

  /** The full cleaning chain (stages 1-5) as one Column — the unit the
    * crawl pre-pass composes between extraction and the line scrub
    * without paying [[normalize]]'s fixed output schema. */
  def clean(c: Column): Column =
    collapseSpaces(
      call_function("graft_nfc",
        stripInvisibles(normalizeControls(repairMojibake(c)))))

  /** (doc_id, n_repairs, changed, clean_text): the full pipeline, with
    * the mojibake diagnostic count and a changed flag (NULL text
    * normalizes to '' and reads unchanged). */
  def normalize(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = coalesce(col(textCol), lit(""))
    val cleaned = clean(base)
    df.select(col(idCol).as("doc_id"),
        repairCount(base).as("n_repairs"),
        cleaned.as("__clean"), base.as("__base"))
      .select(col("doc_id"), col("n_repairs"),
        (col("__clean") =!= col("__base")).as("changed"),
        col("__clean").as("clean_text"))
  }
}
