package graft.operators

import graft.SparkSpec

/** Label propagation: planted-community recovery across a weak bridge,
  * the synchronous-oscillation fixed behavior bounded rounds pin down,
  * convergence, and partitioning independence. */
class LabelPropSpec extends SparkSpec {
  import testImplicits._

  private def run(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    LabelProp.communities(edges.toDF("src", "dst"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def clique(nodes: Seq[Long]): Seq[(Long, Long)] =
    for (i <- nodes; j <- nodes if i < j) yield (i, j)

  test("two cliques over a single bridge keep their own labels") {
    val edges = clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L)) ++
      Seq((4L, 10L))
    val out = run(edges, 6)
    assert(Seq(1L, 2L, 3L, 4L).map(out).toSet === Set(1L))
    assert(Seq(10L, 11L, 12L, 13L).map(out).toSet === Set(10L))
  }

  test("rounds past convergence are identity on the planted-clique graph") {
    val edges = clique(Seq(1L, 2L, 3L, 4L, 5L)) ++ clique(Seq(20L, 21L, 22L, 23L)) ++
      Seq((5L, 20L))
    assert(run(edges, 6) === run(edges, 9))
  }

  test("a star oscillates with period 2 under synchronous updates — deterministically") {
    // center 5, leaves 1..3: round r gives leaves->5/center->1, round
    // r+1 swaps — the classic synchronous-LPA oscillation. Bounded
    // rounds make even this bit-reproducible (why the t85 gate fixes
    // the round count on both sides instead of running "to
    // convergence").
    val star = Seq((5L, 1L), (5L, 2L), (5L, 3L))
    val odd = run(star, 3)
    val even = run(star, 4)
    assert(odd === Map(1L -> 5L, 2L -> 5L, 3L -> 5L, 5L -> 1L))
    assert(even === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L))
    assert(run(star, 5) === odd && run(star, 6) === even)
  }

  test("tie-break is the smallest label, not an arbitrary one") {
    // node 0 sees exactly one neighbor of each initial label: 1, 2, 3
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    assert(run(edges, 1)(0L) === 1L)
  }

  test("partitioning-independent") {
    val edges = (0L until 300L).map(i => (i % 31, (i * 11 + 2) % 31))
    val a = run(edges, 4)
    val b = LabelProp.communities(edges.toDF("src", "dst").repartition(13), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }
}
