package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Statistical language-model quality scoring (the CCNet-style "LM
  * filter"): score each document by its mean bigram surprisal under an
  * add-one-smoothed bigram model trained on the corpus itself,
  *
  *   surprisal(doc) = mean over adjacent (w1, w2) of
  *                    −ln( (c(w1,w2) + 1) / (c(w1) + V) )
  *
  * where counts come from the whole corpus and V = |distinct first
  * words|. Low surprisal = repetitive/templated text, high = rare
  * constructions — both tails are curation targets (pair with the
  * percentile pruning of t16).
  *
  * Scale shape: bigram extraction is shuffle-free (`zip_with` over two
  * slices of the token array — no window function, no per-document
  * shuffle); the model is two hash aggregations over (w1[, w2]) —
  * vocabulary-sized, not corpus-sized; scoring re-joins the bigram
  * stream against the two count tables on word keys and aggregates per
  * document. V rides in as a 1-row broadcast. Deterministic modulo
  * double summation order, absorbed by round(·, 4) like every other
  * engine mean. */
object LmScore {

  /** Adjacent-token bigrams as one shuffle-free column: zip the token
    * array against itself shifted by one. Documents with < 2 tokens
    * produce an empty array. */
  private def bigrams(text: Column): Column = {
    val ts = TextFunctions.tokens(lower(text))
    when(size(ts) >= 2,
      zip_with(
        slice(ts, lit(1), size(ts) - 1),
        slice(ts, lit(2), size(ts) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
  }

  /** Per-document mean bigram surprisal: (doc_id, n_bigrams, surprisal),
    * one row per input document; documents with < 2 tokens score 0.0. */
  def surprisal(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val docBg = df.select(col(idCol).as("doc_id"),
        explode(bigrams(col(textCol))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

    val uni = docBg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val bi = docBg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val vocab = uni.agg(count(lit(1)).as("v"))

    // shuffle_hash hints on the MODEL sides: the r16 BroadcastAudit
    // truth-counted the first join's output (the scored bigram stream,
    // O(corpus tokens) — 26.6 M rows / 1.3 GB at the heaps 100× corpus)
    // being statically broadcast as the second join's build under a
    // 23 MB estimate. The scale-correct shape is stream-probe: hash the
    // vocabulary-sized count tables per partition (spillable in Spark's
    // shuffled hash join) and stream the bigram side through unsorted —
    // the stream is never a build side and never pays a sort.
    val scored = docBg
      .join(bi.hint("shuffle_hash"), Seq("w1", "w2"))
      .join(uni.hint("shuffle_hash"), Seq("w1"))
      .join(broadcast(vocab))
      .select(col("doc_id"),
        (-log((col("c12") + 1.0) / (col("c1") + col("v")))).as("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("s")), 4).as("surprisal"))

    df.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("surprisal"), lit(0.0)).as("surprisal"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): within each
    * language, split documents into head/middle/tail terciles of the LM
    * surprisal distribution — the standard first-pass quality
    * stratification for web corpora (head ≈ Wikipedia-like, tail ≈
    * noise; CCNet keeps head+middle by default).
    *
    * Tercile assignment is by `percent_rank` with a doc-id tiebreak
    * (the t16 convention): exact rational (rank−1)/(n−1), identical in
    * every engine, no interpolated quantile whose last-ulp could flip a
    * boundary document cross-engine.
    *
    * Scale note: the rank window partitions by language, so the widest
    * task is the largest language's doc list — (id, surprisal) pairs
    * only, ~16 bytes/doc. Where even that is too wide, compute
    * approximate tercile THRESHOLDS first (approx_percentile per lang,
    * broadcast) and bucket in the scan stage — the same two-pass trade
    * the extended-stats operator (A5) documents; the rank form is the
    * oracle-able default. */
  def perplexityBuckets(df: DataFrame, textCol: String, idCol: String,
                        langCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = surprisal(df, textCol, idCol)
      .join(df.select(col(idCol).as("doc_id"), col(langCol).as("lang")), "doc_id")
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("surprisal"), col("doc_id"))
    s.withColumn("pr", percent_rank().over(w))
      .select(col("doc_id"), col("lang"), col("n_bigrams"), col("surprisal"),
        round(col("pr"), 4).as("pr"),
        when(col("pr") < lit(1.0 / 3.0), "head")
          .when(col("pr") < lit(2.0 / 3.0), "middle")
          .otherwise("tail").as("bucket"))
  }
}
