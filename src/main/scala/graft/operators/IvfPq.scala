package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF-PQ composed ANN (the IVFADC layout of Jégou et al. 2011 §IV,
  * as deployed by FAISS/ScaNN-class systems): [[IvfIndex]] coarse
  * centroids prune the corpus to `nprobe` cells, then [[PqIndex]]
  * asymmetric-distance scoring ranks ONLY the probed rows with `m`
  * table lookups each, and exact L2 re-ranks the `k·refine` best.
  * This is the shape a 100 TB vector corpus actually runs: the probe
  * filter turns the scan into "read nprobe partitions", and within
  * them the ADC pass reads codes (m small ints per row), not
  * embeddings — the two pruning levers (cell count, code width)
  * compose multiplicatively.
  *
  * This one-shot variant (no persisted index) mirrors
  * `IvfIndex.scanTopK` + `PqIndex.scanTopK` exactly — same
  * deterministic training (fixed iterations, rounded means,
  * first-index tie-breaks), same rounded-then-cut candidate
  * convention — so the composition is oracle-able from the SAME two
  * committed artifacts (t25 centroids + t40 codebooks) with no new
  * goldens: the oracle replays probe ranking, assignment, encoding,
  * the ADC table, the rounded candidate cut, and the exact re-rank in
  * full DuckDB SQL.
  *
  * Non-residual variant: codes quantize the raw vectors, not the
  * residual (vector − coarse centroid). Residual PQ needs per-cell
  * code tables (k·m·kCodes codewords) for a recall gain that the
  * exact re-rank already recovers at these refine factors; the
  * non-residual form is the standard simplification (documented in
  * Jégou et al. §IV.A as IVFADC without residual encoding).
  *
  * Plan shape: ZERO joins — centroids, codebooks, the ADC table, and
  * the query vector all ride as plan literals; the corpus is scanned
  * once (assign + encode + ADC in the same projection), cut by
  * TakeOrdered, and only k·refine rows reach the exact re-rank. */
object IvfPq {

  /** One-shot IVF-PQ top-k over an in-memory corpus. The query vector
    * is selected from the corpus by `queryId` (excluded from results). */
  def scanTopK(df: DataFrame, idCol: String, vecCol: String, dims: Int,
               queryId: Long, k: Int,
               kClusters: Int = 16, ivfIters: Int = 3, nprobe: Int = 2,
               m: Int = 8, kCodes: Int = 16, pqIters: Int = 3,
               refine: Int = 4): DataFrame = {
    require(nprobe >= 1 && refine >= 1, "ivfpq: nprobe, refine must be >= 1")
    val centroids = IvfIndex.train(df, idCol, vecCol, dims, kClusters, ivfIters)
    val cb = PqIndex.train(df, idCol, vecCol, dims, m, kCodes, pqIters)
    val qvec = graft.core.Bounded.collect(
      df.filter(col(idCol) === queryId).select(col(vecCol)),
      1, "IvfPq.queryVec")
      .head.getAs[scala.collection.Seq[Float]](0).toArray
    val probes = IvfIndex.rankClusters(
      centroids.zipWithIndex.map(_.swap), qvec, nprobe)
    val table = PqIndex.adcTable(qvec.map(_.toDouble), cb, kCodes)

    val approx = call_function("graft_pq_adc",
      PqIndex.encodeCol(col(vecCol), cb, m, kCodes),
      typedLit(table), lit(kCodes))
    // probe filter + rounded-approx cut in one scan; id tiebreak keeps
    // the cut deterministic when codes (hence scores) collide
    val cand = df
      .select(col(idCol).as("vec_id"), col(vecCol).as("vec"),
        IvfIndex.assignment(col(vecCol), centroids).as("cluster"),
        round(approx, 4).as("approx_l2sq"))
      .filter(col("cluster").isin(probes: _*))
      .filter(col("vec_id") =!= queryId)
      .orderBy(col("approx_l2sq"), col("vec_id"))
      .limit(k * refine)
    // exact re-rank of k·refine rows (sequential fold = deterministic)
    val exact = aggregate(
      zip_with(col("vec"), typedLit(qvec.map(_.toDouble).toSeq),
        (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    cand.select(col("vec_id"), col("approx_l2sq"),
        round(exact, 4).as("l2_sq"))
      .orderBy(col("l2_sq"), col("vec_id"))
      .limit(k)
  }
}
