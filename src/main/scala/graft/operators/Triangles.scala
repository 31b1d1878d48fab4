package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-node triangle counting over an (undirected view of a) link
  * graph — the local-clustering signal next to the global ones (t62
  * PageRank, t68 SALSA): link farms and spam cliques show up as
  * triangle-dense neighborhoods, genuine editorial link structure is
  * triangle-sparse, so the count feeds crawl-quality gates the same
  * way the rank scores do.
  *
  * Enumeration is the canonical-orientation join: undirected edges
  * stored once as (a < b), a triangle {x < y < z} found exactly once
  * as e(x,y) ⋈ e(x,z) ⋈ e(y,z) — pure integer equality joins, no
  * floats anywhere, so the DuckDB replay is bit-identical.
  *
  * Scale shape: the canonical edge set is materialized ONCE (lazy
  * localCheckpoint, three consumers) and both joins shuffle on a
  * single node key ((a) for the wedge build, (y,z) for the closing
  * edge); the wedge volume is Σ_a deg⁺(a)², the known cost of triangle
  * enumeration. The id-canonical orientation is deterministic and
  * oracle-exact; on power-law graphs the DEGREE-ordered orientation
  * (lowest-degree endpoint first) bounds wedge fan-out at O(√m) per
  * node and is the standard skew lever — it changes no counts, only
  * the join order, and AQE's skew splitting covers the middle ground. */
object Triangles {

  /** Canonical undirected edge set (a < b), deduplicated, self-loops
    * dropped, materialized once for its multiple consumers. */
  private def canonical(edges: DataFrame): DataFrame = edges
    .select(least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b"))
    .where(col("a") =!= col("b"))
    .distinct()
    .localCheckpoint(false)

  /** (node, n_triangles) for every node of `edges` (columns src, dst);
    * direction, duplicates, and self-loops are ignored. Nodes in no
    * triangle report 0 — a structural score must not drop nodes. */
  def perNode(edges: DataFrame): DataFrame = {
    val und = canonical(edges)
    allNodes(und)
      .join(triCounts(und), Seq("node"), "left")
      .select(col("node"), coalesce(col("t"), lit(0L)).as("n_triangles"))
  }

  /** Per-node triangle counts over a canonical edge set (nodes in no
    * triangle absent — callers left-join against [[allNodes]]). */
  private def triCounts(und: DataFrame): DataFrame = {
    val tri = und.as("e1")
      .join(und.as("e2"),
        col("e1.a") === col("e2.a") && col("e2.b") > col("e1.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
      .join(und.as("e3"),
        col("e3.a") === col("y") && col("e3.b") === col("z"))
      .select(col("x"), col("y"), col("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("t"))
  }

  private def allNodes(und: DataFrame): DataFrame =
    und.select(col("a").as("node")).union(und.select(col("b").as("node")))
      .distinct()

  /** Local clustering coefficient (Watts & Strogatz 1998):
    * c(v) = 2·t(v) / (deg(v)·(deg(v)−1)), the share of a node's
    * neighbor pairs that are themselves linked — the per-node
    * link-farm/clique signal t74's raw counts feed. Emitted as the
    * INTEGER fixed-point `coeff_e4` = round(c·10⁴), computed with the
    * half-away integer identity (20000·t + d(d−1)/2) div (d(d−1)) —
    * d(d−1) is even, so the rounding is pure BIGINT arithmetic and
    * bit-identical in any engine (the t77 exact-rounding lesson
    * applied from the start instead of retrofitted). deg ≤ 1 nodes
    * report 0. Same scale shape as [[perNode]]: the canonical edge
    * set is materialized once for its four consumers, the degree
    * aggregation rides the same thin (node) rows as the count. */
  def clustering(edges: DataFrame): DataFrame = {
    val und = canonical(edges)
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    deg.join(triCounts(und), Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("t"), lit(0L)).as("n_triangles"))
      // `div`, not `/`: SQL `/` on integers is DOUBLE division
      .withColumn("coeff_e4",
        when(col("degree") >= 2,
          expr("(20000 * n_triangles + ((degree * (degree - 1)) div 2))" +
            " div (degree * (degree - 1))"))
          .otherwise(lit(0L)).cast("long"))
  }
}
