package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Paragraph-level near-dup scrub — the sub-document complement of the
  * document detectors (t07-t09) and the common remedy for
  * template-heavy corpora: a shared disclaimer/footer paragraph makes
  * no DOCUMENT pair cross the near-dup threshold, yet pollutes every
  * page. Split on blank lines, MinHash each paragraph with the t07
  * machinery, and drop every paragraph that near-duplicates an EARLIER
  * one; re-emit each document from its surviving paragraphs.
  *
  * Dedup semantics (deterministic, first-occurrence-anchored):
  *   - paragraphs are ordered by `okey = doc_id · 10^6 + para_idx`;
  *   - candidate pairs come from LSH band buckets, and each paragraph
  *     is compared against its buckets' FIRST (min-okey) member — the
  *     anchor — never all-pairs: candidate volume is ≤ `bands` per
  *     paragraph BY CONSTRUCTION, linear at any corpus scale;
  *   - a paragraph is dropped iff some anchor earlier than it agrees on
  *     ≥ `threshold` of the signature positions (k/numHashes is an
  *     exact binary fraction, so the cut is engine-portable);
  *   - anchors themselves always survive their own bucket (nothing is
  *     earlier), so every dropped paragraph has a kept first
  *     occurrence UNLESS its anchor was dropped via a different bucket
  *     — the standard greedy-LSH chain trade, accepted for linearity.
  *
  * Scale shape: signatures are computed once behind a single exchange
  * (the [[Dedup.minHashPairs]] ReuseExchange idiom) and every
  * downstream table is (okey, band, bucket)- or (okey, sig)-skinny;
  * paragraph TEXT shuffles exactly once (the per-document regroup).
  * No stage is quadratic in bucket population — templates shared by
  * millions of documents cost min-aggregation, not pairs. */
object ParaDedup {

  /** (doc_id, para_idx, para): trimmed, non-empty, blank-line-split
    * paragraphs; `para_idx` numbers the SURVIVING paragraphs 0-based
    * (the oracle mirrors filter-then-index). */
  def paragraphs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        posexplode(filter(
          transform(split(coalesce(col(textCol), lit("")), "\\n\\s*\\n"),
            p => trim(p)),
          p => length(p) > 0)))
      .toDF("doc_id", "para_idx", "para")

  /** Per-paragraph MinHash signatures: (doc_id, para_idx, okey, sig).
    * Shared by [[scrub]] and the t58 artifact generator so the
    * committed signature table and the live query cannot drift. */
  def signatures(df: DataFrame, idCol: String, textCol: String,
                 numHashes: Int): DataFrame =
    paragraphs(df, idCol, textCol)
      .select(col("doc_id"), col("para_idx"),
        (col("doc_id") * 1000000L + col("para_idx")).as("okey"),
        Dedup.minHashSignature(col("para"), numHashes).as("sig"))

  /** Scrub template paragraphs: (doc_id, n_paras, n_kept, clean_text)
    * with surviving paragraphs rejoined by blank lines, one row per
    * input document (paragraph-less documents come back with 0/0/''). */
  def scrub(df: DataFrame, idCol: String, textCol: String,
            numHashes: Int = 32, bands: Int = 8,
            threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val paras = paragraphs(df, idCol, textCol)
    // one exchange feeds banding AND both sides of the anchor-sig join
    // (the minHashPairs reuse idiom) — without it each consumer
    // re-tokenizes and re-hashes every paragraph
    val sigs = signatures(df, idCol, textCol, numHashes)
      .repartition(col("okey"))

    val banded = sigs.select(col("okey"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            xxhash64(slice(col("sig"), b * rows + 1, lit(rows))).as("bucket"))))
          .as("bb"))
      .select(col("okey"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val anchors = banded.groupBy(col("band"), col("bucket"))
      .agg(min(col("okey")).as("anchor"))
    // join key = the aggregation key: one bucket shuffle serves both
    val cand = banded.join(anchors, Seq("band", "bucket"))
      .filter(col("anchor") < col("okey"))
      .select(col("okey"), col("anchor")).distinct()

    val dropped = cand
      .join(sigs.select(col("okey"), col("sig")), Seq("okey"))
      .join(sigs.select(col("okey").as("anchor"), col("sig").as("asig")),
        Seq("anchor"))
      .filter(call_function("graft_match_frac",
        col("sig"), col("asig")) >= threshold)
      .select(col("okey")).distinct()
      .withColumn("__dropped", lit(true))

    val flagged = paras
      .withColumn("okey", col("doc_id") * 1000000L + col("para_idx"))
      .join(dropped, Seq("okey"), "left")
      .select(col("doc_id"), col("para_idx"), col("para"),
        coalesce(col("__dropped"), lit(false)).as("dropped"))

    val perDoc = flagged.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_paras"),
        sum(when(!col("dropped"), 1L).otherwise(0L)).as("n_kept"),
        // collect_list order is partition-dependent; the struct sort
        // (para_idx leads) restores document order deterministically
        array_join(
          transform(
            array_sort(collect_list(when(!col("dropped"),
              struct(col("para_idx"), col("para"))))),
            s => s.getField("para")),
          "\n\n").as("clean_text"))

    df.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_paras"), lit(0L)).as("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
