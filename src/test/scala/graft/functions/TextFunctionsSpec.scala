package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit coverage for the text-analysis functions not exercised by the
  * oracle queries (lookaround regexes and engine-specific hashes are
  * not DuckDB-expressible). */
class TextFunctionsSpec extends SparkSpec {
  import testImplicits._

  test("subwordCount: BPE-ish pre-tokenization splits on class changes") {
    val df = Seq(
      ("hello world", 2L),       // two letter runs
      ("abc123def", 3L),         // letter/digit/letter
      ("a-b", 3L),               // letter, punct, letter
      ("don't stop", 4L),        // don + ' + t, stop
      ("", 0L)).toDF("text", "expected")
    val out = df.select(TextFunctions.subwordCount(col("text")) === col("expected"))
      .collect().map(_.getBoolean(0))
    assert(out.forall(identity))
  }

  test("rollingHash: deterministic, order-sensitive, bounded by the modulus") {
    val df = Seq("alpha beta gamma", "gamma beta alpha", "alpha beta gamma")
      .toDF("text")
    val hs = df.select(TextFunctions.rollingHash(col("text"))).collect().map(_.getLong(0))
    assert(hs(0) == hs(2))       // deterministic
    assert(hs(0) != hs(1))       // order-sensitive
    assert(hs.forall(h => h >= 0 && h < 2147483647L))
  }

  test("meanWordLength: simple average of token lengths") {
    val df = Seq(("ab cdef", 3.0), ("", 0.0), ("xyz", 3.0)).toDF("text", "expected")
    val out = df.select(abs(TextFunctions.meanWordLength(col("text")) - col("expected")))
      .collect().map(_.getDouble(0))
    assert(out.forall(_ < 1e-9))
  }

  test("shingles: short docs fall back to the whole-text single shingle") {
    val df = Seq("one two", "one two three four").toDF("text")
    val out = df.select(TextFunctions.shingles(col("text"), 3)).collect()
      .map(_.getSeq[String](0))
    assert(out(0) == Seq("one two"))
    assert(out(1) == Seq("one two three", "two three four"))
  }

  test("languageId: obvious sentences route to their language, gibberish to und") {
    val df = Seq(
      "the cat is in that house and it is warm",
      "der hund ist nicht in das haus und zu laut",
      "el perro es y en la casa que los gatos",
      "le chat est en la maison et les chiens une",
      "zzz qqq www xxx").toDF("text")
    val out = df.select(TextFunctions.languageId(col("text"))).collect().map(_.getString(0))
    assert(out.sameElements(Array("en", "de", "es", "fr", "und")))
  }

  test("ngramsRaw preserves duplicates, yields n-k+1 grams, empty when too short") {
    val df = Seq("a b a b a", "a b", "").toDF("text")
    val out = df.select(TextFunctions.ngramsRaw(col("text"), 2))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a b", "b a", "a b", "b a")) // duplicates kept, 5-2+1
    assert(out(1) == Seq("a b"))
    assert(out(2).isEmpty) // tokens("") = [""], size 1 < 2
  }
}
