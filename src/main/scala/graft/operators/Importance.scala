package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** DSIR-style data selection with importance resampling (Xie et al.
  * 2023, "Data Selection for Language Models via Importance Resampling",
  * public literature): score every raw document by how target-like its
  * hashed n-gram distribution is, so a pipeline can up-sample
  * high-quality-looking data at corpus scale without a learned model.
  *
  * Features are hashed unigram buckets (hash trick, `nBuckets` buckets
  * via md5 — the same cross-engine-reproducible bucketing as the hash
  * split/classifier operators). Both the target and the raw corpus are
  * reduced to a `nBuckets`-row Laplace-smoothed distribution; the
  * importance weight of a document is the average per-token
  * log-likelihood ratio
  *
  *   w(d) = (1/|d|) · Σ_{tok ∈ d} ln( p_target[h(tok)] / p_raw[h(tok)] )
  *
  * (length-normalized so long documents aren't favored).
  *
  * Spark-first plan: ONE exploded token pass over the raw corpus feeds
  * both the per-(doc, bucket) counts and the raw bucket distribution;
  * the target distribution is a second aggregate over the target rows
  * only. Both distributions are `nBuckets` rows — they broadcast to the
  * scorer, so the only wide shuffle is the doc-keyed count aggregation.
  * The per-bucket log-ratio is computed ONCE in the broadcast table
  * (never re-derived per row), keeping the scorer a pure
  * multiply-accumulate.
  *
  * Determinism contract: output weight is rounded to 4 dp; empty
  * documents get weight 0.0 and survive (callers decide their fate). */
object Importance {

  /** Per-bucket Laplace-smoothed distribution of a token stream. */
  private def bucketDist(tok: DataFrame, nBuckets: Int, outCol: String) =
    tok.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tok.agg(count(lit(1)).as("tot"))))
      .select(col("bucket"),
        ((col("cnt") + 1.0) / (col("tot") + nBuckets.toDouble)).as(outCol))

  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  targetPred: org.apache.spark.sql.Column,
                  nBuckets: Int = 256): DataFrame = {
    require(nBuckets > 0, "dsirWeights: nBuckets must be positive")
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"),
      targetPred.as("is_target"))
    val bucket = conv(substring(md5(col("t")), 1, 4), 16, 10)
      .cast("long") % nBuckets
    // empty text must contribute NO tokens (split(trim('')) is [''], a
    // phantom empty token) — filter before tokenizing
    val tok = base.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("is_target"),
        explode(TextFunctions.tokens(lower(col("text")))).as("t"))
      .select(col("doc_id"), col("is_target"), bucket.as("bucket"))

    // only buckets observed in the raw corpus can occur in a document,
    // so the log-ratio table needs one row per RAW bucket; a bucket
    // absent from the target takes the Laplace floor 1/(tot_t + B)
    val floorRow = tok.filter(col("is_target"))
      .agg((lit(1.0) / (count(lit(1)) + nBuckets.toDouble)).as("floor_t"))
    val lrTable = bucketDist(tok, nBuckets, "p_r")
      .join(bucketDist(tok.filter(col("is_target")), nBuckets, "p_t"),
        Seq("bucket"), "left")
      .crossJoin(broadcast(floorRow))
      .select(col("bucket"),
        log(coalesce(col("p_t"), col("floor_t")) / col("p_r")).as("lr"))

    val perDoc = tok.groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .join(broadcast(lrTable), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg((round(sum(col("c") * col("lr")) / sum(col("c")), 4) + 0.0)
        .as("weight"), sum(col("c")).as("n_tokens"))

    base.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("weight"), lit(0.0)).as("weight"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }
}
