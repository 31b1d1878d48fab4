package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community detection by synchronous label propagation (Raghavan,
  * Albert & Kumara 2007) — the near-linear-time community pass a link
  * corpus gets before per-community quality scoring or stratified
  * sampling: every node adopts the label most frequent among its
  * neighbors, ties broken by SMALLEST label, so the update is fully
  * deterministic (the paper's random tie-break replaced by a total
  * order — the same determinism move t73's systematic sampling makes
  * on reservoir sampling).
  *
  * BOUNDED-ROUND SEMANTICS (t83 convention): engine and oracle both
  * run exactly `rounds` synchronous updates, so the correctness gate
  * cannot desync on a data-dependent stopping rule — synchronous LPA
  * can oscillate on bipartite structure, and under a fixed round count
  * even an oscillation is bit-identical on both sides. Convergence on
  * planted community graphs is a spec concern (LabelPropSpec).
  *
  * Scale shape: per round ONE equality join of the label table with
  * the symmetrized edge set + ONE (node, label) count + ONE per-node
  * argmax — all over (long, long) or (long, long, long) rows, never
  * payloads. The argmax is a single aggregation via max(struct(c,
  * -label)) — no window, no sort. Labels are checkpointed per round
  * (linear lineage, truncated for the same reason as t62/t83). */
object LabelProp {

  /** (node, label) after `rounds` synchronous updates over `edges`
    * (columns src, dst; direction, duplicates, self-loops ignored).
    * Initial label = node id; isolated endpoints cannot occur (every
    * node in the symmetrized edge set has a neighbor). */
  def communities(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0 && rounds <= 64, "labelprop: rounds must be in [0, 64]")
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val adj = und.select(col("a").as("u"), col("b").as("v"))
      .unionAll(und.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint(false)
    var labels = adj.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(false)
    var i = 0
    while (i < rounds) {
      labels = adj
        .join(labels.withColumnRenamed("node", "v"), "v")
        .groupBy(col("u"), col("label"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("u"))
        .agg(max(struct(col("c").as("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("u").as("node"), (-col("m.nl")).as("label"))
        .localCheckpoint(false)
      i += 1
    }
    labels
  }
}
