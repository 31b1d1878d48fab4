package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS algorithm): hash every k-token gram, slide a
  * window of `w` consecutive gram hashes over the document, and keep
  * each window's MINIMUM. The kept hash VALUES are the fingerprint
  * set — the paper's guarantee is that any shared run of w+k−1 tokens
  * between two documents yields at least one shared fingerprint, while
  * the expected density is only 2/(w+1) of the grams.
  *
  * This implementation works at the fingerprint-VALUE level: the set
  * {min(h[s..s+w−1]) : every window start s} is exactly the set of
  * selected hash values regardless of which tied POSITION a sequential
  * winnower would record, so the engine needs no sequential state and
  * the whole computation is window-min + distinct — deterministic by
  * construction and expressible identically in DuckDB (the oracle
  * replays gram hashing, the window minima, and the density/df math in
  * full SQL; hashes are md5 hex, compared lexicographically in both
  * engines).
  *
  * Scale shape: gram hashing is scan-stage; the only per-document
  * state is the doc-partitioned window (bounded by the longest single
  * document, the same bound every per-doc operator here carries); the
  * fingerprint df aggregation and the join back move 32-hex keys, and
  * a footer fingerprint repeated across millions of documents costs
  * one aggregation row — never a pair explosion. Documents shorter
  * than k tokens contribute no grams and profile as zero-fingerprint
  * rows. */
object Winnowing {

  private def toks(textCol: String): Column =
    split(trim(lower(coalesce(col(textCol), lit("")))), "\\s+")

  /** (doc_id, fp): the distinct winnowing fingerprints per document,
    * as md5 hex strings (the public contract — spec'd against a
    * sequential reference winnower). Internally the selection runs on
    * the 128-bit struct key; the hex form is reconstructed only here,
    * AFTER the distinct, one format per surviving fingerprint. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 4, w: Int = 5): DataFrame =
    selected(df, idCol, textCol, k, w)
      .select(col("doc_id"), col("fp"))
      .distinct()
      .select(col("doc_id"), format_string("%016x%016x",
        col("fp.h").bitwiseXOR(lit(Long.MinValue)),
        col("fp.l").bitwiseXOR(lit(Long.MinValue))).as("fp"))

  /** Window minima with start positions (internal: pre-distinct).
    *
    * Key representation (r20): grams hash to `graft_md5_u128` — the md5
    * digest as an order-isomorphic struct<h,l> of two longs — instead
    * of the 32-hex string. The window min, per-doc distinct and
    * corpus df aggregation all operate on 16-byte keys with long
    * comparisons instead of ~40-byte strings with byte-wise compares
    * (guide §2.3, narrower types); selection is IDENTICAL because the
    * struct order equals the hex string's lexicographic order
    * (order-preserving injection — see [[graft.expr.Md5U128]]),
    * re-pinned by the sequential-reference spec and the t80 oracle. */
  private def selected(df: DataFrame, idCol: String, textCol: String,
                       k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, "winnowing: k and w must be >= 1")
    val grams = df
      .select(col(idCol).as("doc_id"), toks(textCol).as("__ts"))
      .filter(size(col("__ts")) >= k)
      .select(col("doc_id"), (size(col("__ts")) - (k - 1)).as("g"),
        posexplode(transform(
          sequence(lit(1), size(col("__ts")) - (k - 1)),
          i => call_function("graft_md5_u128",
            concat_ws(" ", slice(col("__ts"), i, lit(k))))))
          .as(Seq("pos", "h")))
    val frame = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    // only full windows select (pos ≤ g−w, 0-based); a document with
    // fewer than w grams keeps the paper's ≥1-fingerprint guarantee
    // via its single truncated window at pos 0
    grams.withColumn("fp", min(col("h")).over(frame))
      .filter(col("pos") <= greatest(lit(0), col("g") - w))
  }

  /** Per-document fingerprint profile: gram count, fingerprint count,
    * and how many of the doc's fingerprints recur elsewhere in the
    * corpus (df ≥ 2) — the MOSS-style shared-content signal. */
  def profile(df: DataFrame, idCol: String, textCol: String,
              k: Int = 4, w: Int = 5): DataFrame = {
    // struct keys end-to-end: the profile only counts fingerprints, so
    // the hex reconstruction the public [[fingerprints]] API performs
    // would put 40-byte strings back on the df shuffle for nothing
    val fps = selected(df, idCol, textCol, k, w)
      .select(col("doc_id"), col("fp"))
      .distinct()
    val fdf = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
    val perDoc = fps.join(fdf, "fp")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fps"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("shared_fps"))
    // second scan reads only (id, text) for the gram count — column
    // pruning drops the hash transform from this branch
    df.select(col(idCol).as("doc_id"),
        when(size(toks(textCol)) >= k, size(toks(textCol)) - (k - 1))
          .otherwise(0).cast("long").as("n_grams"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_fps"), lit(0L)).as("n_fps"),
        coalesce(col("shared_fps"), lit(0L)).as("shared_fps"))
  }
}
