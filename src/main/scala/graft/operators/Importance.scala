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
  * Spark-first plan: ONE exploded token pass over the raw corpus is
  * reduced immediately to per-(doc, target-flag, bucket) counts — the
  * only wide shuffle — and that compact frame (≤ nBuckets thin rows
  * per document) is materialized once (lazy localCheckpoint) and feeds
  * EVERY downstream aggregate: raw distribution, target distribution,
  * Laplace floor, per-doc scoring. (r19: the previous shape re-derived
  * the exploded-token subtree per consumer — plan-measured 14 parquet
  * scans of the corpus at sf0.1 for t38; now 2.) Both distributions
  * are `nBuckets` rows — they broadcast to the scorer. The per-bucket
  * log-ratio is computed ONCE in the broadcast table (never re-derived
  * per row), keeping the scorer a pure multiply-accumulate.
  *
  * Determinism contract: output weight is rounded to 4 dp; empty
  * documents get weight 0.0 and survive (callers decide their fate). */
object Importance {

  /** Per-bucket Laplace-smoothed distribution from (bucket, c) counts. */
  private def bucketDist(cnt: DataFrame, nBuckets: Int, outCol: String) =
    cnt.groupBy(col("bucket")).agg(sum(col("c")).as("cnt"))
      .crossJoin(broadcast(
        cnt.agg(coalesce(sum(col("c")), lit(0L)).as("tot"))))
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
    // phantom empty token) — filter before tokenizing. The explode is
    // reduced to per-(doc, flag, bucket) counts in the same pass and
    // materialized ONCE: every downstream aggregate is exact over these
    // integer counts (sum-of-counts ≡ count-of-rows), so the token
    // stream itself is never re-derived.
    val tokCnt = base.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("is_target"),
        explode(TextFunctions.tokens(lower(col("text")))).as("t"))
      .select(col("doc_id"), col("is_target"), bucket.as("bucket"))
      .groupBy(col("doc_id"), col("is_target"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val tgtCnt = tokCnt.filter(col("is_target"))

    // only buckets observed in the raw corpus can occur in a document,
    // so the log-ratio table needs one row per RAW bucket; a bucket
    // absent from the target takes the Laplace floor 1/(tot_t + B)
    val floorRow = tgtCnt
      .agg((lit(1.0) / (coalesce(sum(col("c")), lit(0L)) + nBuckets.toDouble))
        .as("floor_t"))
    val lrTable = bucketDist(tokCnt, nBuckets, "p_r")
      .join(bucketDist(tgtCnt, nBuckets, "p_t"), Seq("bucket"), "left")
      .crossJoin(broadcast(floorRow))
      .select(col("bucket"),
        log(coalesce(col("p_t"), col("floor_t")) / col("p_r")).as("lr"))

    val perDoc = tokCnt.select(col("doc_id"), col("bucket"), col("c"))
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
