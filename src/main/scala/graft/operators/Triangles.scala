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

  /** (node, n_triangles) for every node of `edges` (columns src, dst);
    * direction, duplicates, and self-loops are ignored. Nodes in no
    * triangle report 0 — a structural score must not drop nodes. */
  def perNode(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(false)
    val tri = und.as("e1")
      .join(und.as("e2"),
        col("e1.a") === col("e2.a") && col("e2.b") > col("e1.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
      .join(und.as("e3"),
        col("e3.a") === col("y") && col("e3.b") === col("z"))
      .select(col("x"), col("y"), col("z"))
    val perNode = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("t"))
    und.select(col("a").as("node")).union(und.select(col("b").as("node")))
      .distinct()
      .join(perNode, Seq("node"), "left")
      .select(col("node"), coalesce(col("t"), lit(0L)).as("n_triangles"))
  }
}
