package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Context-window chunking — the step that turns curated documents
  * into fixed-size training samples: overlapping windows of `size`
  * whitespace tokens advancing by `stride` (overlap = size − stride
  * keeps context across boundaries). The complement of t29's sequence
  * PACKING (many short docs → one sequence); chunking splits long docs
  * into window-sized pieces.
  *
  * Window semantics (mirrored verbatim by the t60 oracle):
  *   - tokens = whitespace split of the trimmed text; blank/NULL text
  *     has NO windows (the document emits zero rows — empties were
  *     someone else's filter);
  *   - window i covers tokens [i·stride, i·stride + size); the LAST
  *     window may be shorter but always covers ≥ 1 new token: the
  *     window count is 1 for n ≤ size, else ⌈(n − size)/stride⌉ + 1 —
  *     full coverage, no window wholly contained in its predecessor
  *     (requires stride ≤ size, enforced);
  *   - `start_tok` = i·stride is emitted so a consumer can map a
  *     window back into the document without re-tokenizing.
  *
  * Scale shape: pure scan-stage row-map + explode — zero shuffle, no
  * state; output rows ≈ n/stride per document and each output row is
  * window-sized regardless of document length, which is the point: the
  * downstream trainer sees bounded rows even on a 10 MB outlier page. */
object Chunker {

  /** (doc_id, chunk_idx, start_tok, n_tokens, chunk_text). */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            size: Int = 64, stride: Int = 48): DataFrame = {
    require(size >= 1, "size must be >= 1")
    require(stride >= 1 && stride <= size,
      "stride must be in [1, size] or coverage gaps/empty windows appear")
    val toks = {
      val t = trim(coalesce(col(textCol), lit("")))
      when(length(t) === 0, array().cast("array<string>"))
        .otherwise(split(t, "\\s+"))
    }
    val n = size_(toks)
    // ⌈(n-size)/stride⌉ + 1 in integer arithmetic; the n=0 guard keeps
    // sequence() from its descending-sequence surprise on (0, -1)
    val k = when(n === 0, 0)
      .otherwise(when(n <= size, 1)
        .otherwise(floor((n - lit(size) + lit(stride - 1)) / lit(stride))
          .cast("int") + 1))
    df.select(col(idCol).as("doc_id"), toks.as("__t"), k.as("__k"))
      .select(col("doc_id"),
        explode(when(col("__k") === 0,
            array().cast("array<struct<i:int,c:array<string>>>"))
          .otherwise(transform(sequence(lit(0), col("__k") - 1),
            i => struct(i.as("i"),
              slice(col("__t"), i * stride + 1, lit(size)).as("c"))))).as("w"))
      .select(col("doc_id"),
        col("w.i").as("chunk_idx"),
        (col("w.i") * stride).cast("long").as("start_tok"),
        size_(col("w.c")).cast("long").as("n_tokens"),
        array_join(col("w.c"), " ").as("chunk_text"))
  }

  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)
}
