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
}
