package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the cluster
  * resolution step that turns pairwise detector output
  * ([[Dedup.minHashPairs]] / [[Dedup.jaccardPairs]] /
  * [[Similarity.nearDupPairs]]) into dedup decisions: every document
  * gets its component's minimum id as `cluster_id`, and "keep one doc
  * per cluster" is then a trivial filter (`doc_id = cluster_id`).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * standard scale-safe formulation. Each round is two groupBy shuffles
  * over the EDGE set only (no vertex state table, no driver-side graph),
  * converges in O(log² n) rounds, and strictly shrinks edge targets
  * toward component minima, so worst-case skew is a single groupBy key
  * per star center — exactly what AQE skew handling covers. Per-round
  * `localCheckpoint` truncates the iterative lineage (on a cluster with
  * fault-tolerance requirements, substitute reliable `checkpoint`).
  */
object ConnectedComponents {

  /** Large-star: for every node u (over the bidirected edge view), link
    * each STRICTLY LARGER neighbor to m = min(N(u) ∪ {u}). */
  private def largeStar(edges: DataFrame): DataFrame = {
    val bidir = edges.select(col("u"), col("v"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
    bidir.groupBy(col("u")).agg(collect_set(col("v")).as("nbrs"))
      .select(col("u"),
        least(array_min(col("nbrs")), col("u")).as("m"), col("nbrs"))
      .select(explode(filter(col("nbrs"), n => n > col("u"))).as("big"),
        col("m"))
      .filter(col("big") =!= col("m"))
      .select(col("big").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Small-star: orient every edge large→small, then for every node u
    * link each of its (all smaller-or-equal) neighbors and u itself to
    * m = min of the neighborhood. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges.select(
      greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
    oriented.groupBy(col("u")).agg(collect_set(col("v")).as("nbrs"))
      .select(col("u"), array_min(col("nbrs")).as("m"), col("nbrs"))
      .select(col("m"),
        explode(array_union(col("nbrs"), array(col("u")))).as("n"))
      .filter(col("n") =!= col("m"))
      .select(col("n").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Resolve components of the undirected graph given by (srcCol,
    * dstCol) pairs. Returns ("id", "component") for every node that
    * appears in at least one edge; `component` is the minimum node id
    * of its connected component. Self-loops are ignored. */
  def resolve(pairs: DataFrame, srcCol: String, dstCol: String,
              maxIterations: Int = 20): DataFrame = {
    var edges = pairs
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      // normalize to the large→small orientation the star steps emit, so
      // an already-converged input is recognized on the first comparison
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint()

    var converged = edges.isEmpty
    var i = 0
    while (!converged && i < maxIterations) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      // fixpoint when the edge set is unchanged (both are distinct sets,
      // so two except-counts decide equality)
      converged = next.count() == edges.count() &&
        next.exceptAll(edges).isEmpty
      edges = next
      i += 1
    }
    // a non-converged edge set is NOT a star forest — returning it would
    // silently mislabel components. O(log^2 n) convergence means the
    // default bound covers any realistic graph; failing loudly beats
    // wrong cluster ids.
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge in $maxIterations rounds")

    // at the fixpoint every edge is (node, component-min); nodes that ARE
    // their component's min appear only on the v side
    edges.select(col("u").as("id"), col("v").as("component"))
      .unionAll(edges.select(col("v").as("id"), col("v").as("component")))
      .groupBy(col("id")).agg(min(col("component")).as("component"))
  }

  /** Per-document cluster assignment over a corpus: every document's
    * component min (itself for singletons). The left join keeps
    * untouched documents — the common case at any scale — out of the
    * iterative machinery entirely. */
  def clusters(docs: DataFrame, idCol: String, pairs: DataFrame,
               leftCol: String = "left_id", rightCol: String = "right_id")
      : DataFrame = {
    val cc = resolve(pairs, leftCol, rightCol)
    docs.select(col(idCol))
      .join(cc, col(idCol) === col("id"), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("cluster_id"))
  }
}
