package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** k-core peeling: closed forms, cascade behavior, fixpoint-identity
  * of extra rounds (incl. on the real planted link graph), and
  * partitioning independence. */
class KCoreSpec extends SparkSpec {
  import testImplicits._

  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int = 8): Map[Long, Long] =
    KCore.peel(edges.toDF("src", "dst"), k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4 is a 3-core; a path has an empty 2-core") {
    val k4 = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    assert(run(k4, 3) === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L)), 2) === Map.empty)
  }

  test("a cycle is its own 2-core; a pendant chain cascades off round by round") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(run(cycle, 2) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
    // cycle + chain 4-5-6: 6 peels in round 1, 5 in round 2; the
    // cascade needs multiple rounds, single-round peeling would keep 5
    val chained = cycle ++ Seq((4L, 5L), (5L, 6L))
    assert(run(chained, 2) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
    assert(run(chained, 2, rounds = 1) ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 3L, 5L -> 1L),
      "after one round only the leaf is gone — pins synchronous-round semantics")
  }

  test("rounds past the fixpoint are identity on the planted sf0.001 link graph") {
    // the t83 fixture: functional-affine sparse background (peels away)
    // + the 25-node dense core from two independent residues (survives)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"))
    val id = col("doc_id")
    val edges =
      docs.select((id % 1000).as("src"), ((id * 7 + 1) % 1000).as("dst"))
        .union(docs.where(id % 2 === 0)
          .select((id % 1000).as("src"), ((id * 13 + 3) % 1000).as("dst")))
        .union(docs.select((id % 25).as("src"),
          (expr("doc_id div 25") % 25).as("dst")))
    def m(rounds: Int) = KCore.peel(edges, k = 8, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val at8 = m(8)
    assert(at8.nonEmpty, "planted graph must have a non-empty 8-core")
    assert(at8.keySet.forall(_ < 25L), "background must peel away")
    assert(at8 === m(10), "fixpoint must be reached within 8 rounds")
  }

  test("partitioning-independent") {
    val edges = (0L until 300L).map(i => (i % 30, (i * 7 + 1) % 30))
    val a = run(edges, 3)
    val b = KCore.peel(edges.toDF("src", "dst").repartition(11), 3, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }
}
