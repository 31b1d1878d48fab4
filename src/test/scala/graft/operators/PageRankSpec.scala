package graft.operators

import graft.SparkSpec

/** The integer PageRank recurrence against an in-test reference
  * implementation of the SAME formula (maps and longs — an independent
  * evaluation order), plus structure and determinism contracts. */
class PageRankSpec extends SparkSpec {
  import testImplicits._

  private val Unit0 = 1000000000000L

  /** Reference: same integer recurrence, driver-side. */
  private def ref(edges: Set[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.filter(p => p._1 != p._2)
    val nodes = e.flatMap(p => Seq(p._1, p._2))
    val deg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val r0 = Unit0 / nodes.size
    val tele = 15L * r0 / 100L
    var r = nodes.map(_ -> r0).toMap
    (1 to iters).foreach { _ =>
      val s = e.toSeq.map { case (u, v) => v -> r(u) / deg(u) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      r = nodes.map(v => v -> (tele + 85L * s.getOrElse(v, 0L) / 100L)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int = 8): Map[Long, Long] =
    PageRank.ranks(edges.toDF("src", "dst"), iters = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches the reference recurrence on an asymmetric graph") {
    val edges = Set[(Long, Long)](
      (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 3), (5, 1), (6, 5))
    assert(run(edges.toSeq) === ref(edges, 8))
  }

  test("cycle is symmetric; hub of a star outranks its spokes") {
    val cyc = run(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(cyc.values.toSet.size === 1)
    val star = run(Seq((1L, 9L), (2L, 9L), (3L, 9L), (9L, 1L)))
    // 2 and 3 receive no in-links: teleport-only, equal, and below the
    // hub (1 and 9 trade the bulk of the mass between themselves)
    assert(star(2L) === star(3L))
    assert(star(9L) > star(2L))
    assert(star(1L) > star(2L))
  }

  test("self-loops and duplicate edges are ignored") {
    val base = Seq((1L, 2L), (2L, 1L))
    val noisy = base ++ Seq((1L, 1L), (1L, 2L), (2L, 2L))
    assert(run(noisy) === run(base))
  }

  test("bit-deterministic across partitionings") {
    val edges = (0L until 60L).flatMap(i =>
      Seq((i, (i * 7 + 1) % 40), (i, (i * 13 + 3) % 40)))
    val a = PageRank.ranks(edges.toDF("src", "dst").repartition(7), iters = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = PageRank.ranks(edges.toDF("src", "dst").coalesce(1), iters = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a === b)
    assert(a.toMap === ref(edges.toSet, 6))
  }

  test("dangling mass is dropped: totals shrink but stay positive") {
    val withSink = run(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)))
    assert(withSink.values.sum < Unit0)
    assert(withSink.values.forall(_ > 0))
  }

  private def runP(edges: Seq[(Long, Long)], seeds: Seq[Long],
                   iters: Int = 8): Map[Long, Long] =
    PageRank.personalized(edges.toDF("src", "dst"), seeds.toDF("node"),
      iters = iters).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("personalized with seeds = all nodes degenerates to global PageRank") {
    val edges = Seq[(Long, Long)](
      (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 3), (5, 1), (6, 5))
    val all = edges.flatMap(p => Seq(p._1, p._2)).distinct
    assert(runP(edges, all) === run(edges))
  }

  test("rank starves to zero outside the seeds' reach; seeds outside graph ignored") {
    // two disjoint cycles; seeds only in the first (99 is not a node)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 10L))
    val out = runP(edges, Seq(1L, 99L))
    assert(out(10L) === 0L && out(11L) === 0L,
      "the component unreachable from the seeds must starve")
    assert(out(1L) > 0L && out(2L) > 0L && out(3L) > 0L)
    // |S| counted after intersection: seed 1 alone owns the whole teleport
    assert(out(1L) >= Unit0 * 15L / 100L / 2L, "seed teleport not diluted by ghost seeds")
    intercept[IllegalArgumentException] {
      runP(Seq((1L, 2L)), Seq(42L))
    }
  }

  test("weightedRanks with unit weights equals unweighted ranks; heavy edges pull rank") {
    import org.apache.spark.sql.functions.{col, lit}
    val edges = Seq[(Long, Long)]((1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 1))
    val unit = PageRank.weightedRanks(
        edges.toDF("src", "dst").withColumn("w", lit(1L)), iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(unit === run(edges))
    // tilt 1's mass toward 2: with w(1→2)=9, node 2 must outrank its
    // equal-weight self
    val tilted = PageRank.weightedRanks(
        edges.toDF("src", "dst")
          .withColumn("w", org.apache.spark.sql.functions
            .when(col("src") === 1 && col("dst") === 2, 9L).otherwise(1L)),
        iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tilted(2L) > unit(2L))
    // non-positive weights are dropped: a w=0 edge is no edge
    val zeroed = PageRank.weightedRanks(
        (edges :+ (5L, 4L)).toDF("src", "dst")
          .withColumn("w",
            org.apache.spark.sql.functions
              .when(col("src") === 5 && col("dst") === 4, 0L).otherwise(1L)),
        iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(zeroed === unit)
  }

  test("personalized is bit-deterministic across partitionings") {
    val edges = (0L until 60L).flatMap(i =>
      Seq((i, (i * 7 + 1) % 40), (i, (i * 13 + 3) % 40)))
    val seeds = (0L until 40L by 5L).toSeq
    val a = PageRank.personalized(edges.toDF("src", "dst").repartition(7),
        seeds.toDF("node"), iters = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = PageRank.personalized(edges.toDF("src", "dst").coalesce(1),
        seeds.toDF("node"), iters = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a === b)
  }
}
