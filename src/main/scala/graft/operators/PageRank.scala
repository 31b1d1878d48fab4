package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over a link graph (Brin & Page 1998) — the canonical
  * link-quality signal a crawl-curation pipeline derives from the t61
  * edge extraction: seed-quality scoring, crawl prioritization, and
  * harmonic-style domain weighting all start from it.
  *
  * INTEGER-EXACT fixpoint: rank mass is carried in integer units of
  * `unit` (default 10^12 = one unit of total probability), every
  * division is a BIGINT floor, and the damping 0.85 is the rational
  * 85/100 applied as `(85·x) div 100`:
  *
  *   r₀(v)    = unit div N
  *   rₖ₊₁(v)  = tele + (85 · Σ_{u→v} (rₖ(u) div deg(u))) div 100,
  *   tele     = (15 · (unit div N)) div 100
  *
  * so the whole iteration is a pure integer recurrence — bit-identical
  * in any engine, any partitioning, any summation order (the t57
  * margin lesson applied from the start: no floating rounding anywhere,
  * nothing for an oracle to mismatch). The floor truncation loses
  * ≤ deg(u) units per node per round (~10^-12 relative) and dangling
  * mass is dropped rather than redistributed — both standard
  * simplifications, both deterministic, both documented here.
  *
  * Scale shape: edges+degrees are materialized ONCE (lazy
  * localCheckpoint — 2·iters consumers must not re-derive the edge
  * subtree) and each iteration is exactly one join (ranks ⋈ edges on
  * src) and one aggregation shuffle (sum by dst) over (id, long)-thin
  * rows; the 1000-node fixture and a 10^9-node web graph run the same
  * plan. The recurrence is PURE lineage — no per-iteration action, the
  * whole fixpoint is one Spark job; the only driver scalar is the node
  * count. Iterations are fixed (the convergence-test variant would add
  * one light action per round, the CC trade). */
object PageRank {

  /** (node, rank) for every node of `edges` (columns src, dst).
    * Self-loops and duplicate edges are ignored; nodes appearing only
    * as dst are sinks (rank teleport-only contributors). */
  def ranks(edges: DataFrame, iters: Int = 8,
            unit: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 64, "iters must be in [1, 64]")
    val e = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct()
    // one exchange on src serves the degree count AND every iteration's
    // rank join; checkpoint cuts the 2·iters-consumer re-derivation
    val ed = e.repartition(col("src"))
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false)
    // scalar count action — control-plane, never row data to the driver
    val n = nodes.count()
    require(n > 0, "PageRank needs a non-empty graph")
    val r0 = unit / n
    val tele = 15L * r0 / 100L
    // Loop shape (r19): the fixpoint carries only the aggregated mass
    // table s(dst) and folds the rank formula r(u) = tele +
    // floor(85·s(u) div 100) into the NEXT iteration's contribution
    // expression (LEFT join — a src that received no mass has s = 0 and
    // still spreads its teleport share). This removes the per-iteration
    // `nodes` join (one SortMergeJoin + one Exchange of the node table
    // per round; plan-measured 50 Exchanges / 16 SMJ at sf0.1), and
    // iteration 1 needs no join at all (r₀ is a constant). Zeros and
    // the final rank formula are restored once, in the output
    // projection. The integer recurrence is untouched — output
    // bit-identical (oracle-pinned).
    var s = ed
      .select(col("dst"), floor(lit(r0) / col("deg")).cast("long").as("c"))
      .groupBy(col("dst")).agg(sum(col("c")).as("s"))
    var i = 1
    while (i < iters) {
      val prev = s.select(col("dst").as("src"), col("s"))
      s = ed.join(prev, Seq("src"), "left")
        .select(col("dst"),
          floor((lit(tele) +
            floor(lit(85L) * coalesce(col("s"), lit(0L)) / 100L).cast("long"))
            / col("deg")).cast("long").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      i += 1
    }
    nodes.join(s, nodes("node") === s("dst"), "left")
      .select(nodes("node"),
        (lit(tele) +
          floor(lit(85L) * coalesce(s("s"), lit(0L)) / 100L).cast("long"))
          .as("rank"))
  }

  /** Personalized PageRank / TrustRank (Gyöngyi, Garcia-Molina &
    * Pedersen 2004): identical integer recurrence, but rank mass
    * teleports ONLY to `seeds` (a trusted page set) —
    *
    *   r₀(v)   = unit div |S| if v ∈ S else 0
    *   tele(v) = (15 · (unit div |S|)) div 100 if v ∈ S else 0
    *
    * so authority diffuses outward from the seeds and spam far from
    * them starves: the standard seed-propagation gate next to the
    * global rank (t62) and the core depth (t83). Seeds not present in
    * the graph are ignored; |S| counts the intersection. Same scale
    * shape as [[ranks]] — one join + one aggregation per iteration
    * over thin rows, the seed flag rides the checkpointed node table. */
  def personalized(edges: DataFrame, seeds: DataFrame, iters: Int = 8,
                   unit: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 64, "iters must be in [1, 64]")
    val e = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val flagged = nodes
      .join(seeds.select(col("node")).distinct().withColumn("__s", lit(1)),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("__s"), lit(0)).as("seed"))
      .localCheckpoint(false)
    // the SRC node's seed flag rides the one checkpointed edge table —
    // the fused loop below needs tele(u) at the edge row, and attaching
    // it once here replaces attaching it every round via the old
    // per-iteration `flagged` join (same fusion as [[ranks]], r19)
    val ed = e.repartition(col("src"))
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
      .join(flagged.select(col("node").as("src"), col("seed")), Seq("src"))
      .localCheckpoint(false)
    val nS = flagged.where(col("seed") === 1).count()
    require(nS > 0, "personalized PageRank needs at least one seed in the graph")
    val r0 = unit / nS
    val tele = 15L * r0 / 100L
    // r₀(u) = r0·seed(u): non-seed rows contribute floor(0/deg) = 0 but
    // stay in the frame, so s₁'s key set (every dst) matches the old
    // plan's exactly. Bit-identical output (oracle-pinned).
    var s = ed
      .select(col("dst"),
        floor(when(col("seed") === 1, lit(r0)).otherwise(lit(0L)) / col("deg"))
          .cast("long").as("c"))
      .groupBy(col("dst")).agg(sum(col("c")).as("s"))
    var i = 1
    while (i < iters) {
      val prev = s.select(col("dst").as("src"), col("s"))
      s = ed.join(prev, Seq("src"), "left")
        .select(col("dst"),
          floor((when(col("seed") === 1, lit(tele)).otherwise(lit(0L)) +
            floor(lit(85L) * coalesce(col("s"), lit(0L)) / 100L).cast("long"))
            / col("deg")).cast("long").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      i += 1
    }
    flagged.join(s, flagged("node") === s("dst"), "left")
      .select(flagged("node"),
        (when(flagged("seed") === 1, lit(tele)).otherwise(lit(0L)) +
          floor(lit(85L) * coalesce(s("s"), lit(0L)) / 100L).cast("long"))
          .as("rank"))
  }

  /** Weighted PageRank: identical integer recurrence with rank mass
    * split proportionally to EDGE WEIGHTS (anchor counts, click
    * counts) instead of uniformly —
    *   contribution(u→v) = (r(u) · w(u,v)) div W(u),  W(u) = Σ_v w(u,v)
    * Duplicate (src, dst) rows are weight-summed; self-loops and
    * non-positive weights dropped (the latter would corrupt W(u)). Same
    * scale shape as [[ranks]]: weights ride the one checkpointed edge
    * table, each iteration is one join + one aggregation over thin
    * rows. Multiplication order (r·w before div) keeps the floor loss
    * at one unit per edge. The quotient is computed with SQL `div`
    * (exact BIGINT division) — NOT floor over `/`, whose double cast
    * loses integer precision once r·w exceeds 2^53 (w ≳ 9e3 at the
    * default unit) and would silently diverge from the oracle's exact
    * BIGINT `//`. The only remaining bound is BIGINT overflow of r·w
    * itself: r ≤ unit, so weights up to 2^63/unit ≈ 9.2e6 are safe at
    * the default unit; larger weights need a smaller unit. */
  def weightedRanks(edges: DataFrame, iters: Int = 8,
                    unit: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 64, "iters must be in [1, 64]")
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .where(col("src") =!= col("dst") && col("w") > 0)
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
    val ed = e.repartition(col("src"))
      .join(e.groupBy(col("src")).agg(sum(col("w")).as("wsum")), "src")
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false)
    val n = nodes.count()
    require(n > 0, "weighted PageRank needs a non-empty graph")
    val r0 = unit / n
    val tele = 15L * r0 / 100L
    // same loop fusion as [[ranks]] (r19): carry only s(dst), fold the
    // rank formula into the contribution expression via a LEFT join,
    // restore zeros once at the end. Bit-identical output.
    var s = ed
      .select(col("dst"), lit(r0).as("rr"), col("w"), col("wsum"))
      .select(col("dst"), expr("rr * w div wsum").as("c"))
      .groupBy(col("dst")).agg(sum(col("c")).as("s"))
    var i = 1
    while (i < iters) {
      val prev = s.select(col("dst").as("src"), col("s"))
      s = ed.join(prev, Seq("src"), "left")
        .select(col("dst"),
          (lit(tele) +
            floor(lit(85L) * coalesce(col("s"), lit(0L)) / 100L).cast("long"))
            .as("rr"), col("w"), col("wsum"))
        .select(col("dst"), expr("rr * w div wsum").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      i += 1
    }
    nodes.join(s, nodes("node") === s("dst"), "left")
      .select(nodes("node"),
        (lit(tele) +
          floor(lit(85L) * coalesce(s("s"), lit(0L)) / 100L).cast("long"))
          .as("rank"))
  }
}
