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
}
