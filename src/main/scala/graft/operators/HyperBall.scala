package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperBall (Boldi, Rosa & Vigna 2011): the neighborhood function of
  * every node, approximated by iterating HLL counters over the edge
  * set — the way ball sizes, centralities, and "how far is the rest of
  * the web" distributions are computed on graphs whose exact BFS from
  * every node is hopeless (all-pairs reachability is O(n·m)).
  *
  * The counter of node v after round r sketches the OUT-ball
  * B_r(v) = {v} ∪ { reach of ≤ r out-steps }. The update is pure
  * register algebra (the [[HllSketch]] max-merge):
  *   B_r(v) = B_{r-1}(v) ∪max ⋃ { B_{r-1}(w) : (v,w) ∈ E }
  * so each round is ONE equality join of the register table with the
  * edge set plus ONE (node, bucket) max-aggregation — rows are
  * (long, int, int) triples bounded by 256·|V|, never adjacency
  * payloads. That is the paper's systolic formulation, and it is the
  * 100 TB shape: state per node is a fixed 256-register sketch no
  * matter how large the balls grow, where exact frontier sets would be
  * O(|ball|) per node. Per-round `localCheckpoint` is load-bearing:
  * round r references round r−1 TWICE (self-merge + neighbor join), so
  * inlined lineage doubles per round (the t83 lesson at base 2).
  *
  * ENGINE-PARITY-EXACT surface (t64 convention): the emitted per-round
  * summary is integer register algebra only — nb (non-empty registers)
  * and rsum (sum of register maxima) — both bit-identical under a
  * DuckDB replay of the same md5 bucket/rank contract. The float
  * cardinality interpretation stays in [[HllSketch.estimate]], outside
  * the oracle gate. */
object HyperBall {

  /** Per-node ball summaries for radius 0..rounds over directed
    * `edges` (columns src, dst; duplicates and self-loops ignored).
    * Output: (node, radius, nb, rsum) — nb = non-empty registers of
    * the radius-ball sketch, rsum = sum of register maxima. Both are
    * monotone in radius (register max-merge only grows). */
  def neighborhoods(edges: DataFrame, rounds: Int): DataFrame =
    iterate(edges, rounds)
      .map { case (radius, regs) => summarize(regs, radius) }
      .reduce(_ unionByName _)

  /** The per-radius register tables (radius → (node, bucket, r)) the
    * summaries and estimates both read. */
  private def iterate(edges: DataFrame, rounds: Int): Seq[(Int, DataFrame)] = {
    require(rounds >= 0 && rounds <= 32, "hyperball: rounds must be in [0, 32]")
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
    // B_0(v) = {v}: each node's counter starts with its own hash.
    var regs = nodes.select(col("node"),
        HllSketch.bucketCol(col("node")).as("bucket"),
        HllSketch.rankCol(col("node")).as("r"))
      .localCheckpoint(false)
    val out = Seq.newBuilder[(Int, DataFrame)]
    out += 0 -> regs
    var k = 1
    while (k <= rounds) {
      val fromNbrs = e.join(regs.withColumnRenamed("node", "dst"), "dst")
        .select(col("src").as("node"), col("bucket"), col("r"))
      regs = regs.unionByName(fromNbrs)
        .groupBy(col("node"), col("bucket"))
        .agg(max(col("r")).as("r"))
        .localCheckpoint(false)
      out += k -> regs
      k += 1
    }
    out.result()
  }

  private def summarize(regs: DataFrame, radius: Int): DataFrame =
    regs.groupBy(col("node"))
      .agg(count(lit(1)).as("nb"), sum(col("r")).as("rsum"))
      .select(col("node"), lit(radius).as("radius"),
        col("nb").cast("long").as("nb"), col("rsum").cast("long").as("rsum"))

  /** Harmonic centrality ESTIMATES — the application HyperBall was
    * built for (Boldi & Vigna 2014, "Axioms for centrality"):
    *   H(v) = Σ_{r=1..rounds} (|B_r(v)| − |B_{r−1}(v)|) / r
    * with ball sizes read from the float HLL estimator. Deliberately
    * OUTSIDE the oracle gate (t64 convention: registers are exact, an
    * estimate is an interpretation of them) — spec-anchored against
    * exact BFS harmonic centrality on planted graphs instead. Deltas
    * are clamped at 0: the raw/linear-counting estimator switch can
    * wobble a hair negative even though registers only grow. */
  def harmonic(edges: DataFrame, rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perRadius = iterate(edges, rounds)
      .map { case (radius, regs) =>
        HllSketch.estimate(regs, Seq("node"))
          .select(col("node"), lit(radius).as("radius"), col("estimate"))
      }
      .reduce(_ unionByName _)
    val w = Window.partitionBy(col("node")).orderBy(col("radius"))
    perRadius
      .withColumn("delta",
        greatest(col("estimate") - lag(col("estimate"), 1).over(w), lit(0.0)))
      .where(col("radius") >= 1)
      .groupBy(col("node"))
      .agg(round(sum(col("delta") / col("radius")), 4).as("harmonic_c"))
  }
}
