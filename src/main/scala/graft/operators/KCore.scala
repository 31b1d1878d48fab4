package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by synchronous peeling (Seidman 1983; the
  * distributed round-bounded formulation of Montresor et al. 2013):
  * repeatedly drop every node whose degree in the SURVIVING subgraph
  * is < k. The k-core is the fixpoint — the standard link-graph
  * denoising stage next to the rank scores (t62/t68) and the local
  * structure signals (t74/t82): spam farms live in shallow cores,
  * editorial hubs in deep ones.
  *
  * BOUNDED-ROUND SEMANTICS, deliberately: both the engine and the
  * oracle compute exactly `rounds` synchronous peel rounds, so the
  * two sides are equal BY DEFINITION whether or not the fixpoint has
  * been reached — no data-dependent round count can ever desync the
  * correctness gate. Peeling is monotone (a removed node never
  * returns), so rounds past the fixpoint are identity and a
  * convergence assertion belongs in specs, not in the semantics
  * (KCoreSpec pins rounds=N == rounds=N+2 on the planted graphs).
  *
  * Scale shape: each round is one degree aggregation + two semi-join
  * shuffles over (long, long) edge rows — never node payloads — and
  * the per-round result is lazily checkpointed because round r
  * references round r−1 THREE times (degree, u-side filter, v-side
  * filter): without the checkpoint the lineage is 3^rounds copies of
  * the base plan. Rounds are fixed and small (peeling converges in
  * O(degeneracy) synchronous rounds; 8 covers any web-ish graph cut
  * at small k). */
object KCore {

  /** Surviving (node, degree) after `rounds` peel rounds at threshold
    * `k` over `edges` (columns src, dst); direction, duplicates, and
    * self-loops are ignored. `degree` is the node's degree in the
    * surviving subgraph. */
  def peel(edges: DataFrame, k: Int, rounds: Int = 8): DataFrame = {
    require(k >= 1, "kcore: k must be >= 1")
    require(rounds >= 1 && rounds <= 32, "kcore: rounds must be in [1, 32]")
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    var cur = und.select(col("a").as("u"), col("b").as("v"))
      .unionAll(und.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint(false)
    var i = 0
    while (i < rounds) {
      val surv = cur.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("u"))
      cur = cur.join(surv, Seq("u"))
        .join(surv.select(col("u").as("v")), Seq("v"))
        .select(col("u"), col("v"))
        .localCheckpoint(false)
      i += 1
    }
    cur.groupBy(col("u"))
      .agg(count(lit(1)).as("degree"))
      .select(col("u").as("node"), col("degree"))
  }
}
