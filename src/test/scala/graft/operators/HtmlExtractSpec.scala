package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Density-rule truth table for the HTML main-content extractor: each
  * classification rule at its boundary, the entity-decode order, and
  * the segmentation edge cases the regex-level contract promises. */
class HtmlExtractSpec extends SparkSpec {
  import testImplicits._

  private def run(html: String): Row =
    Seq((1L, html)).toDF("doc_id", "html")
      .transform(HtmlExtract.extract(_, "doc_id", "html"))
      .collect().head

  private val longText = "word " * 20 // 100 visible chars, trims to 99

  test("chrome is boilerplate, body text is content") {
    val r = run(
      "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>" +
        s"<p>$longText</p>" +
        "<footer>Copyright 2024 <a href=\"/tos\">Terms of Service and Privacy</a></footer>")
    assert(r.getAs[Long]("n_blocks") === 3)
    assert(r.getAs[Long]("n_content") === 1)
    assert(r.getAs[String]("extracted_text") === longText.trim)
    // discarded: nav "Home About" (10) + footer (43 = 15 + 28 link)
    val total = 10 + 99 + 43
    assert(r.getAs[Double]("boilerplate_share") ===
      BigDecimal(1.0 - 99.0 / total).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("min-chars boundary: 25 visible chars is content, 24 is not") {
    assert(run("<p>" + "a" * 25 + "</p>").getAs[Long]("n_content") === 1)
    assert(run("<p>" + "a" * 24 + "</p>").getAs[Long]("n_content") === 0)
  }

  test("link-density boundary: 33/100 linked chars is content, 34 is not") {
    def page(linked: Int) =
      "<p>" + "x" * (99 - linked) + " <a href=\"#\">" + "a" * linked + "</a></p>"
    assert(run(page(33)).getAs[Long]("n_content") === 1)
    assert(run(page(34)).getAs[Long]("n_content") === 0)
  }

  test("long but link-dense block (link farm) is boilerplate") {
    val r = run(
      "<div><a href=\"/1\">Product one long name</a> " +
        "<a href=\"/2\">Product two long name</a> " +
        "<a href=\"/3\">Product three long name</a></div>")
    assert(r.getAs[Long]("n_blocks") === 1)
    assert(r.getAs[Long]("n_content") === 0)
  }

  test("inline link inside long prose keeps the block content") {
    val r = run(s"<p>$longText See the <a href=\"/r\">reference manual</a> now.</p>")
    assert(r.getAs[Long]("n_content") === 1)
    assert(r.getAs[String]("extracted_text")
      .endsWith("See the reference manual now."))
  }

  test("entities decode AFTER tag stripping, &amp; last") {
    val r = run("<p>Fish &amp; chips &lt;daily&gt; cost &amp;lt; 5 &quot;pounds&quot; &#39;cheap&#39; here&nbsp;now.</p>")
    // &lt;daily&gt; becomes literal text (never a strippable tag);
    // &amp;lt; single-decodes to &lt;, not <
    assert(r.getAs[String]("extracted_text") ===
      "Fish & chips <daily> cost &lt; 5 \"pounds\" 'cheap' here now.")
  }

  test("closing tags match case-insensitively; unclosed blocks merge") {
    val r = run(s"<P>$longText</P><div><p>first half $longText</div>")
    // </P> splits; the unclosed <p> merges into the <div> block
    assert(r.getAs[Long]("n_blocks") === 2)
    assert(r.getAs[String]("extracted_text")
      === longText.trim + "\n" + s"first half $longText".trim)
  }

  test("anchor capture stops at nested markup (under-counts, never over)") {
    // direct text of <a> is empty -> density 0, block classified by length alone
    val r = run(s"<p>$longText <a href=\"#\"><b>${"b" * 60}</b></a></p>")
    assert(r.getAs[Long]("n_content") === 1)
  }

  test("NULL and empty html: row kept, empty extraction, share 0.0") {
    val out = Seq((1L, null.asInstanceOf[String]), (2L, ""))
      .toDF("doc_id", "html")
      .transform(HtmlExtract.extract(_, "doc_id", "html"))
      .orderBy("doc_id").collect()
    out.foreach { r =>
      assert(r.getAs[Long]("n_blocks") === 0)
      assert(r.getAs[Double]("boilerplate_share") === 0.0)
      assert(r.getAs[String]("extracted_text") === "")
    }
  }

  test("tag strip inserts a space so adjacent words never fuse") {
    val r = run("<p>" + "x" * 30 + "<br>" + "y" * 30 + "</p>")
    assert(r.getAs[String]("extracted_text") === "x" * 30 + " " + "y" * 30)
  }

  test("plan shape: scan-stage projection only, no shuffle") {
    val df = Seq((1L, "<p>hi</p>")).toDF("doc_id", "html")
      .transform(HtmlExtract.extract(_, "doc_id", "html"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  private def runLinks(html: String) =
    Seq((1L, html)).toDF("doc_id", "html")
      .transform(HtmlExtract.links(_, "doc_id", "html"))
      .orderBy("link_idx").collect().toSeq

  test("links: href + anchor text pairs in document order") {
    val rows = runLinks(
      "<nav><a href=\"/\">Home</a> <a href=\"/a\" class=\"x\">About&nbsp;us</a></nav>" +
        "<p>see <a href=\"/ref/3\">the   manual</a></p>")
    assert(rows.map(r => (r.getAs[Int]("link_idx"),
      r.getAs[String]("href"), r.getAs[String]("anchor_text"))) === Seq(
      (0, "/", "Home"), (1, "/a", "About us"), (2, "/ref/3", "the manual")))
  }

  test("links: unquoted/missing href and NULL html yield no rows") {
    assert(runLinks("<a href=/x>bare</a> <a name=\"n\">no href</a>").isEmpty)
    assert(Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "html")
      .transform(HtmlExtract.links(_, "doc_id", "html")).collect().isEmpty)
  }

  test("links: nested markup ends the anchor capture (no row)") {
    // the ([^<]*) group cannot match "<b>bold</b>" — under-count contract
    assert(runLinks("<a href=\"/x\"><b>bold</b></a>").isEmpty)
  }

  test("links extraction is scan-stage (no shuffle)") {
    val plan = Seq((1L, "<a href=\"/\">h</a>")).toDF("doc_id", "html")
      .transform(HtmlExtract.links(_, "doc_id", "html"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
