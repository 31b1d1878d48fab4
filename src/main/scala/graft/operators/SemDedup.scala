package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication (SemDeDup, Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedding space with k-means, then
  * prune within each cluster any vector whose cosine similarity to a
  * LOWER-ID vector of the same cluster reaches the threshold — the
  * embedding-space counterpart of the text near-dup detectors, catching
  * paraphrases and template families that share no surface n-grams.
  *
  * The clustering is what makes this tractable: pairwise similarity is
  * only ever computed WITHIN a cluster, so the quadratic term is bounded
  * by cluster size, not corpus size — `kClusters` is the knob and should
  * scale ~n/„target cluster size‟ as the corpus grows (the published
  * method uses the same regime: 50k clusters for LAION-scale corpora).
  * Per-cluster skew lands on one join key and is exactly what AQE
  * skew-join splitting covers.
  *
  * Everything is deterministic, so the operator is golden-oracle-able
  * like the other embedding queries: training is [[IvfIndex.train]]
  * (lowest-id init, fixed iterations, rounded means), the prune rule
  * compares ROUNDED cosines, and "earlier" is vector-id order — no RNG,
  * no partition-order dependence.
  *
  * Scale shape: one training pass (see IvfIndex), then a cluster-keyed
  * self-join over (id, vec, cluster) rows. The assignment expression is
  * pure scan-stage work (16 codegen'd cosines against literal
  * centroids, no shuffle), so each of the plan's references to the
  * assigned table costs one parallel scan — never a join or exchange;
  * at shuffle-join sizes the `repartition(cluster)` exchange is
  * ReuseExchange-shareable across the self-join sides, and at
  * broadcast sizes the planner ships the small side instead. No vector
  * ever appears as a shuffle KEY (vectors ride the cluster partition,
  * ids key everything else — the same contract as the text detectors).
  * Output is one row per input vector: its cluster, the max cosine to
  * any earlier cluster-mate (−2.0 when it has none — below any real
  * cosine), and the prune verdict. "Keep" = `NOT pruned`; survivors
  * are exactly the SemDeDup canonical set.
  */
object SemDedup {

  /** [[prune]] with the cluster count auto-scaled to the corpus
    * ([[IvfIndex.autoK]]): one control-plane count picks
    * k ≈ n / targetClusterSize (floor 16), so the within-cluster
    * quadratic term stays bounded by targetClusterSize as the corpus
    * grows instead of growing as (n/16)² — the "50 k clusters at LAION
    * scale" regime as the production default. The fixed-k [[prune]]
    * remains the oracle-determinism path (t28 pins k = 16).
    *
    * Training is SAMPLE-CAPPED: with auto-k, full-corpus Lloyd's costs
    * O(n·k) = O(n²/targetClusterSize) cosines PER ITERATION — measured
    * at the 1000× probe corpus (round 14): the iters+1 full passes at
    * k = 977 over 4 M vectors put t28 at 11.1× its 100× wall for 10×
    * the data, and the next decade multiplies per-row work another
    * ~10×. The published regime trains on a bounded sample (k-means
    * sees a few hundred rows per centroid); here: when
    * n > max(trainSampleCap, 256·k), train on the deterministic
    * lowest-hash subset of ~1.25× that size (xxhash64 of the id — no
    * RNG, no partition-order dependence, golden-able), leaving only
    * the single final assignment pass at full corpus width, which
    * exact SemDeDup semantics require and [[IvfIndex.autoK]]'s maxK
    * cap bounds asymptotically. Every driver-SF corpus (≤ 40 k
    * vectors) sits below the cap, so oracles and committed centroid
    * artifacts are unchanged. */
  def pruneAuto(df: DataFrame, idCol: String, vecCol: String, dims: Int,
                threshold: Double, targetClusterSize: Long = 4096,
                iters: Int = 3, minK: Int = 16,
                trainSampleCap: Long = 65536L): DataFrame = {
    val n = df.count()
    val k = IvfIndex.autoK(n, targetClusterSize, minK = minK)
    val cap = math.max(trainSampleCap, 256L * k)
    val trainOn =
      if (n <= cap) None
      else {
        // ~1.25·cap expected rows; the margin keeps the sample ≥ k with
        // overwhelming probability (train() requires ≥ k and fails loud)
        val m = 1L << 20
        val thresh = math.min(m, (m * 1.25 * cap / n).toLong.max(1L))
        Some(df.filter(pmod(xxhash64(col(idCol)), lit(m)) < lit(thresh)))
      }
    prune(df, idCol, vecCol, dims, threshold, k, iters, trainOn)
  }

  def prune(df: DataFrame, idCol: String, vecCol: String, dims: Int,
            threshold: Double, kClusters: Int = 16, iters: Int = 3,
            trainOn: Option[DataFrame] = None): DataFrame = {
    val centroids = IvfIndex.train(trainOn.getOrElse(df), idCol, vecCol,
      dims, kClusters, iters)
    val assigned = df
      .select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("cluster", IvfIndex.assignment(col("vec"), centroids))
      .repartition(col("cluster"))

    val earlier = assigned.select(col("cluster"),
      col("id").as("prev_id"), col("vec").as("prev_vec"))
    val maxPrev = assigned.join(earlier, Seq("cluster"))
      .filter(col("prev_id") < col("id"))
      .select(col("id"),
        round(call_function("graft_cosine", col("vec"), col("prev_vec")), 4)
          .as("sim"))
      .groupBy(col("id")).agg(max(col("sim")).as("max_sim_prev"))

    assigned.select(col("id"), col("cluster"))
      .join(maxPrev, Seq("id"), "left")
      .select(col("id").as(idCol), col("cluster"),
        coalesce(col("max_sim_prev"), lit(-2.0)).as("max_sim_prev"),
        (coalesce(col("max_sim_prev"), lit(-2.0)) >= threshold).as("pruned"))
  }
}
