package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the corpus-fixture invariant the tokenization oracle parity
  * depends on: the engine splits tokens with Java-regex `\s+`
  * (`[ \t\n\x0B\f\r]`) while the DuckDB oracles split with RE2 `\s+`
  * (`[ \t\n\f\r]`) — the two classes differ on exactly ONE character,
  * vertical tab U+000B. A corpus containing U+000B would tokenize
  * differently engine vs oracle (token counts, shingles, fertility —
  * every `\s`-split surface). Rather than rewrite 24 split sites on
  * both sides for a character the driver's generator never emits, the
  * invariant is asserted here against the REAL testdata at every SF:
  * if a corpus regeneration ever introduces U+000B, this spec goes red
  * and names the fix (pin `[ \t\n\f\r]` on both sides).
  *
  * Text that enters via the crawl path is immune regardless:
  * `TextNormalize.ControlClass` strips U+000B before any tokenization.
  */
class FixtureInvariantSpec extends SparkSpec {

  test("documents.text is U+000B-free at every generated SF") {
    val sfs = Seq("sf0.001", "sf0.01", "sf0.1")
      .map(s => s"/root/testdata/$s")
      .filter(d => new java.io.File(s"$d/documents.parquet").exists())
    assert(sfs.nonEmpty, "no testdata corpora found")
    sfs.foreach { dir =>
      val offending = Tables.documents(spark, dir)
        .filter(col("text").contains("\u000B"))
        .count()
      assert(offending == 0L,
        s"$dir/documents.parquet: $offending rows contain U+000B — " +
          "Java \\s and RE2 \\s diverge on this character; pin an " +
          "explicit [ \\t\\n\\f\\r] class on both engine and oracle sides")
    }
  }

  test("documents.text is BMP-only at every generated SF") {
    // Spark's length() counts UTF-16 code units, DuckDB's counts code
    // points — they agree exactly on BMP text and diverge on every
    // astral character (emoji, CJK extension B, musical symbols). Any
    // length()-comparing oracle (t01 char counts, t88 script counts,
    // t90 line rules, the symbol-ratio family) silently depends on
    // this; assert it against the real corpora so a generator change
    // surfaces as THIS named failure, not scattered hash mismatches.
    val sfs = Seq("sf0.001", "sf0.01", "sf0.1")
      .map(s => s"/root/testdata/$s")
      .filter(d => new java.io.File(s"$d/documents.parquet").exists())
    sfs.foreach { dir =>
      val astral = Tables.documents(spark, dir)
        .filter(col("text").rlike("[\\x{10000}-\\x{10FFFF}]"))
        .count()
      assert(astral == 0L,
        s"$dir/documents.parquet: $astral rows contain astral (non-BMP) " +
          "characters — Spark UTF-16-unit length vs DuckDB code-point " +
          "length diverge; length-based oracles need a code-point count " +
          "on the Spark side (e.g. length(regexp_replace(text, '.', 'x')))")
    }
  }
}
