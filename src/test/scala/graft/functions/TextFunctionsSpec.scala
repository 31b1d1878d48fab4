package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit coverage for the text-analysis functions not exercised by the
  * oracle queries (lookaround regexes and engine-specific hashes are
  * not DuckDB-expressible). */
class TextFunctionsSpec extends SparkSpec {
  import testImplicits._

  test("blocklistShare: occurrence-counted, case-insensitive, blank-safe") {
    val df = Seq(
      (1L, "the BAD word bad again"), // 2 of 5 blocked (case-folded)
      (2L, "clean text only"),
      (3L, ""),
      (4L, "bad")
    ).toDF("id", "t")
    val words = Seq("bad")
    val out = df.select(col("id"),
        TextFunctions.blocklistHits(col("t"), words).as("h"),
        round(TextFunctions.blocklistShare(col("t"), words), 4).as("s"))
      .orderBy("id").collect()
    assert(out(0).getLong(1) == 2L && out(0).getDouble(2) == 0.4)
    assert(out(1).getLong(1) == 0L && out(1).getDouble(2) == 0.0)
    assert(out(2).getLong(1) == 0L && out(2).getDouble(2) == 0.0)
    assert(out(3).getLong(1) == 1L && out(3).getDouble(2) == 1.0)
  }

  test("sentence/syllable/flesch: closed forms on known text") {
    val df = Seq(
      (1L, "The cat sat. The dog ran! Did it run?"), // 3 sentences, 9 words
      (2L, "no terminal punctuation here"),          // floored to 1 sentence
      (3L, "")
    ).toDF("id", "t")
    val out = df.select(col("id"),
        TextFunctions.sentenceCount(col("t")).as("s"),
        TextFunctions.syllableCount(col("t")).as("sy"),
        TextFunctions.fleschScore(col("t")).as("f"))
      .orderBy("id").collect()
    assert(out(0).getLong(1) == 3L)
    // vowel groups: e,a,a,e,o,a,i,i,u -> 9
    assert(out(0).getLong(2) == 9L)
    // 206.835 - 1.015*(9/3) - 84.6*(9/9) = 119.19
    assert(out(0).getDouble(3) == 119.19)
    assert(out(1).getLong(1) == 1L)
    assert(out(2).getLong(1) == 0L && out(2).getDouble(3) == 0.0)
  }

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

  test("scriptCount/digitCount: per-script character counts, null-safe") {
    val df = Seq(
      (1L, "abc Где 42 ελ 中文"),
      (2L, ""),
      (3L, null.asInstanceOf[String])).toDF("id", "t")
    val out = df.select(col("id"),
        TextFunctions.scriptCount(col("t"), "Latin").as("nl"),
        TextFunctions.scriptCount(col("t"), "Cyrillic").as("nc"),
        TextFunctions.scriptCount(col("t"), "Greek").as("ng"),
        TextFunctions.scriptCount(col("t"), "Han").as("nh"),
        TextFunctions.digitCount(col("t")).as("nd"))
      .orderBy("id").collect()
    assert(out(0).toSeq.drop(1) === Seq(3L, 3L, 2L, 2L, 2L))
    assert(out(1).toSeq.drop(1) === Seq(0L, 0L, 0L, 0L, 0L))
    assert(out(2).toSeq.drop(1) === Seq(0L, 0L, 0L, 0L, 0L), "null text counts as empty")
  }

  test("code-line detection: indent, trailing brace/semicolon, fences, blank-safe") {
    val doc = "prose line one\n    indented();\nint main() {\n}\n\n```\ncode\n```\nmore prose"
    val out = Seq(doc).toDF("t").select(
      TextFunctions.nonblankLines(col("t")),
      TextFunctions.codeLines(col("t")),
      TextFunctions.hasCodeFence(col("t"))).head()
    assert(out.getLong(0) === 8, "blank line excluded")
    // indented();  main() {  }  ``` ×2  and 'code' is NOT code-ish
    assert(out.getLong(1) === 5)
    assert(out.getBoolean(2))
    val none = Seq("just prose\nanother line").toDF("t").select(
      TextFunctions.codeLines(col("t")), TextFunctions.hasCodeFence(col("t"))).head()
    assert(none.getLong(0) === 0 && !none.getBoolean(1))
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
