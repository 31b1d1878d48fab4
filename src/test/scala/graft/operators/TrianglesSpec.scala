package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Closed-form triangle counts on known shapes. */
class TrianglesSpec extends SparkSpec {
  import testImplicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a K4 gives 3 triangles per node; a path gives none") {
    val k4 = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    assert(counts(k4) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    val path = Seq((10L, 11L), (11L, 12L), (12L, 13L))
    assert(counts(path) == Map(10L -> 0L, 11L -> 0L, 12L -> 0L, 13L -> 0L))
  }

  test("direction, duplicates, and self-loops are ignored") {
    // triangle expressed with mixed directions + noise
    val noisy = Seq((1L, 2L), (2L, 1L), (3L, 2L), (1L, 3L), (1L, 1L),
      (1L, 2L))
    assert(counts(noisy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("two triangles sharing an edge: shared nodes count both") {
    // {1,2,3} and {2,3,4} share edge (2,3)
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
    assert(counts(e) == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("deterministic under repartitioning") {
    val edges = (0L until 400L).map(i => (i % 40, (i * 7 + 1) % 40))
    val a = counts(edges)
    val b = Triangles.perNode(edges.toDF("src", "dst").repartition(13))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  private def coeffs(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] =
    Triangles.clustering(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("clustering coefficient: closed forms on K4, path, and a kite") {
    val k4 = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    // complete graph: every coefficient 1.0 → 10000
    assert(coeffs(k4).values.toSet === Set((3L, 3L, 10000L)))
    // path: interior nodes deg 2 with no triangle → 0; leaves deg 1 → 0
    val path = Seq((10L, 11L), (11L, 12L), (12L, 13L))
    assert(coeffs(path) === Map(10L -> ((1L, 0L, 0L)), 11L -> ((2L, 0L, 0L)),
      12L -> ((2L, 0L, 0L)), 13L -> ((1L, 0L, 0L))))
    // kite: triangle {1,2,3} plus tail 3-4. node 3: deg 3, 1 triangle
    // → 2/(3·2) = 1/3 → 3333 (half-away on 3333.33…)
    val kite = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(coeffs(kite)(3L) === ((3L, 1L, 3333L)))
    assert(coeffs(kite)(1L) === ((2L, 1L, 10000L)))
    assert(coeffs(kite)(4L) === ((1L, 0L, 0L)))
  }

  test("clustering coefficient rounds half away from zero in pure integers") {
    // node 0: deg 4 (q = 12), 3 triangles → 6/12 = 0.5 → 5000 exact;
    // build wheel-ish: 0 connected to 1,2,3,4; edges 1-2, 2-3, 3-4
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L),
      (1L, 2L), (2L, 3L), (3L, 4L))
    assert(coeffs(e)(0L) === ((4L, 3L, 5000L)))
  }
}
