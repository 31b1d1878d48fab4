package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Connected-components correctness on known graphs plus cluster
  * assignment over a corpus with planted duplicate groups. */
class ConnectedComponentsSpec extends SparkSpec {
  import testImplicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.resolve(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain collapses to the minimum id") {
    val got = components(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep separate minima") {
    val got = components(Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L)))
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(10L) == 10L && got(11L) == 10L)
    assert(got(20L) == 20L && got(21L) == 20L && got(22L) == 20L)
  }

  test("cycle and star resolve to minima; self-loops and duplicate edges ignored") {
    val got = components(Seq(
      (5L, 6L), (6L, 7L), (7L, 5L),              // cycle
      (100L, 101L), (100L, 102L), (100L, 103L),  // star centered off-min
      (103L, 99L),                               // attach a smaller min
      (5L, 5L), (6L, 5L), (5L, 6L)))             // self-loop + dups
    assert(got(5L) == 5L && got(6L) == 5L && got(7L) == 5L)
    Seq(99L, 100L, 101L, 102L, 103L).foreach(n => assert(got(n) == 99L))
  }

  test("long path converges within the iteration bound (log-round contraction)") {
    val n = 64
    val edges = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
    val got = components(edges)
    assert(got.size == n)
    assert(got.values.forall(_ == 0L))
  }

  test("random graphs match a union-find reference (200 nodes, 5 seeds)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val n = 200
      val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find reference
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> {
          // component min = min node id among nodes sharing the root
          val root = find(id.toInt)
          (0 until n).filter(j => find(j) == root).min.toLong
        }).toMap
      val got = components(edges)
      assert(got == expected, s"seed $seed mismatch")
    }
  }

  test("block hygiene: intermediate round checkpoints are released") {
    // a graph wide enough to force several star rounds, so resolve
    // checkpoints repeatedly; only the FINAL round's star forest may
    // stay persisted after the result is consumed
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(2000)((rnd.nextInt(500).toLong, rnd.nextInt(500).toLong))
      .filter { case (a, b) => a != b }
    val before = spark.sparkContext.getPersistentRDDs.size
    ConnectedComponents.resolve(edges.toDF("a", "b"), "a", "b").count()
    val leaked = spark.sparkContext.getPersistentRDDs.size - before
    assert(leaked <= 1,
      s"$leaked checkpoint RDDs left persisted — rounds must clean up")
  }

  test("co-located graph resolves in the contraction alone: star loop skipped") {
    // one partition → partition-local union-find resolves the whole
    // graph; the bootstrap fixpoint test must detect the star forest and
    // skip the loop, so maxIterations = 0 succeeds
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(500)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    val got = ConnectedComponents.resolve(
        edges.toDF("a", "b").repartition(1), "a", "b", maxIterations = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLoop = components(edges)
    assert(got == viaLoop)
  }

  test("cross-partition graph still needs star rounds (fixpoint test is not lax)") {
    // a chain split so every partition sees disjoint edges: contraction
    // cannot connect them, so with maxIterations = 0 resolve must refuse
    // rather than return wrong components
    val edges = (0L until 63L).map(i => (i, i + 1))
    val df = edges.toDF("a", "b").repartition(8)
    intercept[IllegalStateException] {
      ConnectedComponents.resolve(df, "a", "b", maxIterations = 0).count()
    }
  }

  test("empty pair graph: every document is its own singleton cluster") {
    val docs = (1L to 5L).toDF("doc_id")
    val noPairs = Seq.empty[(Long, Long)].toDF("left_id", "right_id")
    val got = ConnectedComponents.clusters(docs, "doc_id", noPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 5L).map(i => i -> i).toMap)
  }

  test("clusters assigns singletons their own id and planted dups a shared min") {
    val docs = (1L to 10L).toDF("doc_id")
    val pairs = Seq((2L, 7L), (7L, 9L), (3L, 4L)).toDF("left_id", "right_id")
    val got = ConnectedComponents.clusters(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 3L, 5L -> 5L,
      6L -> 6L, 7L -> 2L, 8L -> 8L, 9L -> 2L, 10L -> 10L))
  }

  test("keep-one-per-cluster filter yields exactly one survivor per component") {
    val docs = (1L to 100L).toDF("doc_id")
    val pairs = (1L to 99L by 2).map(i => (i, i + 1)).toDF("left_id", "right_id")
    val out = ConnectedComponents.clusters(docs, "doc_id", pairs)
    val survivors = out.filter(col("doc_id") === col("cluster_id")).count()
    assert(survivors == 50)
    // every cluster id is a member of its own cluster (a real doc id)
    val ids = out.select("cluster_id").distinct()
      .join(docs, col("cluster_id") === col("doc_id"), "left_anti").count()
    assert(ids == 0)
  }
}
