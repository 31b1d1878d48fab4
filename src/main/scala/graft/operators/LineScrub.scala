package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-wide repeated-line scrub — the exact-match boilerplate
  * removal CCNet and RefinedWeb run before (and cheaper than) any
  * near-dup pass: a line whose trimmed text appears in more than
  * `maxDocFreq` DISTINCT documents is navigation/cookie/footer
  * boilerplate and is dropped from every document; everything else
  * keeps its in-document order. Complements t58 (paragraph NEAR-dup
  * via MinHash: catches edits) and t42 (intra-corpus duplicate spans):
  * this pass is exact, line-grained, and frequency-thresholded — the
  * cheap first scrub of a crawl snapshot. The reference has no text
  * surface (numeric channels); extension surface like the rest of the
  * LLM-pipeline family.
  *
  * Contract (mirrored verbatim by the t63 oracle):
  *   - lines = split on '\n'; each line TRIMMED for matching AND for
  *     output (indentation is presentation, not content);
  *   - blank lines (empty after trim) are structure, not content:
  *     never counted, never dropped — paragraph breaks survive for
  *     t58 downstream;
  *   - a non-blank line is hot ⟺ its trimmed text occurs in
  *     > maxDocFreq distinct documents (distinct: a line repeated
  *     inside ONE page is repetition (t17/t32's business), not
  *     cross-site boilerplate);
  *   - every document survives with (doc_id, text, n_lines, n_kept):
  *     kept lines rejoined with '\n' in original order, n_lines /
  *     n_kept counting non-blank lines before / after the drop.
  *     NULL text behaves as '' (0 lines, '' out) — a scrub never
  *     silently eats a document (the t53/t55 convention).
  *
  * Scale shape: explode is scan-stage; ONE `repartition(line)`
  * exchange feeds BOTH the document-frequency aggregate and the
  * probe side of the hot-line join (identical subtree → reused
  * exchange, the t58 pattern), so line text shuffles once; the
  * per-document regroup shuffles kept text once more. The hot set is
  * provably ≤ total_lines / maxDocFreq rows (each hot line needs
  * > maxDocFreq distinct docs), so AQE turns the left join into a
  * broadcast at runtime whenever that bound bites — no manual hint
  * needed, and no driver-side collection anywhere. Skew-safe: a line
  * occurring a billion times is ONE aggregate row, and the regroup
  * key (doc_id) bounds each task at one document's lines. */
object LineScrub {

  /** (doc_id, text, n_lines, n_kept), one row per input document. */
  def scrub(docs: DataFrame, idCol: String, textCol: String,
            maxDocFreq: Int): DataFrame = {
    require(maxDocFreq >= 1, "maxDocFreq must be >= 1")
    val lines = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(coalesce(col(textCol), lit("")), "\n"))
          .as(Seq("line_idx", "raw")))
      .select(col("doc_id"), col("line_idx"), trim(col("raw")).as("line"))
      .repartition(col("line"))
    val hot = lines.where(length(col("line")) > 0)
      .groupBy(col("line"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .where(col("df") > maxDocFreq)
      .select(col("line"), lit(true).as("__hot"))
    val marked = lines.join(hot, Seq("line"), "left")
      .select(col("doc_id"), col("line_idx"), col("line"),
        coalesce(col("__hot"), lit(false)).as("hot"))
    marked.groupBy(col("doc_id"))
      .agg(collect_list(struct(col("line_idx"), col("line"), col("hot")))
        .as("cs"))
      .select(col("doc_id"),
        array_join(transform(
          filter(array_sort(col("cs")), c => !c.getField("hot")),
          c => c.getField("line")), "\n").as("text"),
        size(filter(col("cs"),
          c => length(c.getField("line")) > 0)).cast("long").as("n_lines"),
        size(filter(col("cs"),
          c => length(c.getField("line")) > 0 && !c.getField("hot")))
          .cast("long").as("n_kept"))
  }
}
