package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Truth table for the text-normalization pipeline: each stage at its
  * contract edge (mojibake repair order, control normalization,
  * invisible strip vs ZWJ keep, NFC composition, space collapse), the
  * native graft_nfc kernel vs java.text.Normalizer, and the scan-stage
  * plan shape. */
class TextNormalizeSpec extends SparkSpec {
  import testImplicits._

  private def run(text: String): Row =
    Seq((1L, text)).toDF("doc_id", "text")
      .transform(TextNormalize.normalize(_, "doc_id", "text"))
      .collect().head

  test("cp1252 mojibake repairs restore the original characters") {
    val r = run("donâ€™t say â€œno cafÃ© Ã¼ber rangeâ€“wide â€” end")
    assert(r.getAs[String]("clean_text") ===
      "don’t say “no café über range–wide — end")
    assert(r.getAs[Long]("n_repairs") === 6L)
    assert(r.getAs[Boolean]("changed"))
  }

  test("repair order: dash patterns run before their quote byproducts") {
    // "â€“" (= â € “) must be consumed as a dash before "â€œ" → “ runs;
    // a reordered table would leave a stray â€ prefix
    assert(run("xâ€“y").getAs[String]("clean_text") === "x–y")
    assert(run("xâ€œy").getAs[String]("clean_text") === "x“y")
  }

  test("stray Â before NBSP drops; NBSP becomes plain space") {
    val r = run("padÂ\u00A0ded and\u00A0this")
    assert(r.getAs[String]("clean_text") === "pad ded and this")
    assert(r.getAs[Long]("n_repairs") === 1L)
  }

  test("controls: CRLF and CR to LF, TAB to space, C0 stripped") {
    val r = run("a\r\nb\rc\td bell\u0007x\u0000y")
    assert(r.getAs[String]("clean_text") === "a\nb\nc d bellxy")
  }

  test("zero-width space and BOM removed, ZWJ kept") {
    assert(run("zero\u200Bwidth \uFEFFbom").getAs[String]("clean_text") ===
      "zerowidth bom")
    // 👩‍💻 = woman + ZWJ + laptop: stripping the ZWJ would break emoji
    val zwj = "👩‍💻"
    assert(run(zwj).getAs[String]("clean_text") === zwj)
  }

  test("NFD sequences compose to NFC") {
    val r = run("nfd é and Å end")
    assert(r.getAs[String]("clean_text") === "nfd é and Å end")
    assert(!r.getAs[String]("clean_text").contains("́"))
  }

  test("space runs collapse, newline-hugging spaces drop, newlines kept") {
    assert(run("  a   b  \n   c\n\nd  ").getAs[String]("clean_text") ===
      "a b\nc\n\nd")
  }

  test("NULL and clean text: unchanged, zero repairs") {
    val rows = Seq((1L, null.asInstanceOf[String]), (2L, "already clean"))
      .toDF("doc_id", "text")
      .transform(TextNormalize.normalize(_, "doc_id", "text"))
      .collect()
    assert(rows(0).getAs[String]("clean_text") === "")
    assert(!rows(0).getAs[Boolean]("changed"))
    assert(rows(1).getAs[String]("clean_text") === "already clean")
    assert(!rows(1).getAs[Boolean]("changed"))
    assert(rows.forall(_.getAs[Long]("n_repairs") === 0L))
  }

  test("graft_nfc matches java.text.Normalizer on mixed inputs") {
    val inputs = Seq("é", "Ǻ", "café", "plain",
      "ẛ̣", "", "ﬁn") // long s with dots, ligature stays (NFC)
    val got = inputs.toDF("s")
      .select(call_function("graft_nfc", col("s")).as("n"))
      .collect().map(_.getString(0)).toSeq
    val want = inputs.map(
      java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(got === want)
  }

  test("graft_nfc returns the input object on already-normalized text") {
    import org.apache.spark.unsafe.types.UTF8String
    val s = UTF8String.fromString("already normal")
    assert(graft.expr.Nfc.normalize(s) eq s)
  }

  test("normalization is a pure scan-stage row-map (no shuffle)") {
    val plan = Seq((1L, "x")).toDF("doc_id", "text")
      .transform(TextNormalize.normalize(_, "doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
