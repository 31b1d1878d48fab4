package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → main-content extraction — the FIRST stage of every real
  * crawl-to-corpus pipeline (boilerplate/nav/chrome removal before any
  * quality or dedup pass). The reference has no HTML surface (its only
  * web-ish inputs are metadata JSON fetches, `restapi/app_fs.py:71-95`),
  * so this is extension surface like the rest of the LLM-pipeline
  * family; the heuristics are the published text/link-density family
  * (jusText, Pomikálek 2011; boilerpipe, Kohlschütter et al. WSDM'10;
  * trafilatura's rule layer).
  *
  * Model: a page is a flat sequence of BLOCKS delimited by closing
  * block-level tags; a block is CONTENT iff its visible text is at
  * least [[MinChars]] characters AND at most [[MaxLinkDensity]] of
  * those characters sit inside anchor tags. Everything else (nav bars,
  * footers, link farms, ad stubs, headings) is boilerplate. Per block:
  *
  *   1. segment: split on `</p|div|nav|footer|header|li|h1-6|ul|ol|
  *      table|section|article|aside>` (case-insensitive);
  *   2. visible text: strip every `<...>` tag (replaced by a space so
  *      adjacent words don't fuse), THEN decode the six common
  *      entities (&amp; last, so `&amp;lt;` yields the literal
  *      `&lt;` — and decoding cannot fabricate tags because stripping
  *      already happened), then collapse whitespace runs and trim;
  *   3. link text: the directly-enclosed text of each `<a>...</a>`
  *      (nested markup inside an anchor ends the capture — a
  *      deliberate under-count on the rare anchor-wrapping-markup
  *      case), normalized the same way;
  *   4. classify, then emit the content blocks' text joined by
  *      newlines plus the share of visible characters that were
  *      discarded.
  *
  * This is the regex-level treatment of the well-formed common subset,
  * not an HTML5 tree parser: unclosed block tags merge into the next
  * block, scripts/styles contribute their source text. That is the
  * standard trade the density heuristics were designed for — they
  * classify junk-looking blocks OUT rather than requiring a parse.
  *
  * Scale shape: pure scan-stage row-map built from string/regex/array
  * built-ins — no UDF, no shuffle, no state; cost is linear in page
  * bytes and the whole pass pipelines into whatever consumes
  * `extracted_text` (quality gates, dedup, tokenization). At 100 TB
  * the plan is FileScan → Project, embarrassingly parallel. */
object HtmlExtract {

  /** Minimum visible characters for a block to count as content. */
  val MinChars = 25

  /** Maximum fraction of a content block's characters inside anchors. */
  val MaxLinkDensity = 0.33

  private val BlockClose =
    "(?i)</(?:p|div|nav|footer|header|li|h[1-6]|ul|ol|table|section|article|aside)>"
  private val TagRe = "<[^>]*>"
  private val AnchorRe = "(?i)<a[^>]*>([^<]*)</a>"

  /** The six common entities, `&amp;` LAST (double-escaped input stays
    * single-escaped instead of over-decoding). Mirrored verbatim by the
    * t56 oracle SQL. */
  private def decodeEntities(c: Column): Column =
    replace(replace(replace(replace(replace(replace(c,
      lit("&nbsp;"), lit(" ")),
      lit("&lt;"), lit("<")),
      lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")),
      lit("&#39;"), lit("'")),
      lit("&amp;"), lit("&"))

  private def normalize(c: Column): Column =
    trim(regexp_replace(decodeEntities(c), "\\s+", " "))

  /** Visible text of one raw block: tags → spaces, then entity decode,
    * then whitespace collapse. Decode AFTER stripping, so decoded
    * `&lt;div&gt;` is text, never structure. */
  def blockText(b: Column): Column =
    normalize(regexp_replace(b, TagRe, " "))

  /** Total normalized characters of directly-enclosed anchor text. */
  def linkChars(b: Column): Column =
    coalesce(aggregate(
      transform(regexp_extract_all(b, lit(AnchorRe), lit(1)),
        a => length(normalize(a))),
      lit(0), (acc, x) => acc + x), lit(0))

  /** The page as an array of non-empty (text, link_chars) block structs
    * — the segmentation + normalization steps shared by every consumer.
    * NULL html = empty page (an extractor must not drop the row). */
  def blocks(html: Column): Column =
    filter(
      transform(split(coalesce(html, lit("")), BlockClose),
        b => struct(blockText(b).as("text"), linkChars(b).as("link_chars"))),
      s => length(s.getField("text")) > 0)

  /** `href="…"` + directly-enclosed text of each anchor, both capture
    * groups of one pattern. Double-quoted hrefs only (the well-formed
    * common subset, same trade as the block contract above). */
  val LinkRe =
    "(?i)<a\\s[^>]*href\\s*=\\s*\"([^\"]*)\"[^>]*>([^<]*)</a>"

  /** (doc_id, link_idx, href, anchor_text) — one row per anchor in
    * document order, anchor text entity-decoded + collapsed like block
    * text. The anchor-text corpus build (link-graph datasets, anchor
    * retrieval) starts here. Pure scan-stage row-map + explode, zero
    * shuffle; NULL html = no links. */
  def links(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val h = coalesce(col(htmlCol), lit(""))
    df.select(col(idCol).as("doc_id"),
        regexp_extract_all(h, lit(LinkRe), lit(1)).as("__h"),
        regexp_extract_all(h, lit(LinkRe), lit(2)).as("__t"))
      .select(col("doc_id"),
        posexplode(col("__h")).as(Seq("link_idx", "href")), col("__t"))
      .select(col("doc_id"), col("link_idx"), col("href"),
        blockText(element_at(col("__t"), col("link_idx") + 1))
          .as("anchor_text"))
  }

  /** (doc_id, n_blocks, n_content, boilerplate_share, extracted_text):
    * content blocks joined by '\n', and the fraction of visible
    * characters discarded as boilerplate (0.0 for an empty page —
    * nothing was discarded). The three-projection shape keeps each
    * array expression (segmentation, classification, aggregation)
    * evaluated once per row. */
  def extract(df: DataFrame, idCol: String, htmlCol: String,
              minChars: Int = MinChars,
              maxLinkDensity: Double = MaxLinkDensity): DataFrame = {
    val isContent = (s: Column) =>
      length(s.getField("text")) >= minChars &&
        s.getField("link_chars").cast("double") /
          length(s.getField("text")) <= maxLinkDensity
    val chars = (arr: Column) =>
      coalesce(aggregate(arr, lit(0),
        (acc, s) => acc + length(s.getField("text"))), lit(0))
    df.select(col(idCol).as("doc_id"), blocks(col(htmlCol)).as("__blocks"))
      .select(col("doc_id"), col("__blocks"),
        filter(col("__blocks"), isContent).as("__content"))
      .select(col("doc_id"),
        size(col("__blocks")).cast("long").as("n_blocks"),
        size(col("__content")).cast("long").as("n_content"),
        when(chars(col("__blocks")) === 0, lit(0.0))
          .otherwise(round(lit(1.0) -
            chars(col("__content")).cast("double") / chars(col("__blocks")), 4))
          .as("boilerplate_share"),
        concat_ws("\n", transform(col("__content"), _.getField("text")))
          .as("extracted_text"))
  }
}
