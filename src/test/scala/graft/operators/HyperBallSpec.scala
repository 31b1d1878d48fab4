package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HyperBall: register identity against exact BFS ball membership,
  * radius monotonicity, sink behavior, and partitioning independence. */
class HyperBallSpec extends SparkSpec {
  import testImplicits._

  private def run(edges: Seq[(Long, Long)], rounds: Int): Map[(Long, Int), (Long, Long)] =
    HyperBall.neighborhoods(edges.toDF("src", "dst"), rounds)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

  /** Exact out-balls by BFS, then the SAME summary computed through
    * HllSketch.registers over explicit (node, member) rows — the
    * sketch of the true ball set must equal the iterated sketch. */
  private def bruteForce(edges: Seq[(Long, Long)], rounds: Int): Map[(Long, Int), (Long, Long)] = {
    // same universe as the operator: endpoints of non-self-loop edges
    val real = edges.filter(e => e._1 != e._2).distinct
    val adj = real.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    val nodes = real.flatMap(e => Seq(e._1, e._2)).distinct
    var balls: Map[Long, Set[Long]] = nodes.map(n => n -> Set(n)).toMap
    val result = Map.newBuilder[(Long, Int), (Long, Long)]
    def emit(radius: Int): Unit = {
      val members = balls.toSeq.flatMap { case (n, s) => s.map(n -> _) }
      HllSketch.registers(members.toDF("node", "member"), Seq("node"), col("member"))
        .groupBy("node").agg(count(lit(1)).as("nb"), sum("r").as("rsum"))
        .collect()
        .foreach(r => result += (r.getLong(0), radius) -> (r.getLong(1), r.getLong(2)))
    }
    emit(0)
    for (k <- 1 to rounds) {
      balls = balls.map { case (n, s) =>
        n -> (s ++ s.flatMap(m => adj.getOrElse(m, Set.empty)))
      }
      emit(k)
    }
    result.result()
  }

  test("iterated registers equal the sketch of the exact BFS ball (path + cycle + random)") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(run(path, 3) === bruteForce(path, 3))
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(run(cycle, 4) === bruteForce(cycle, 4))
    val rand = (0L until 120L).map(i => (i % 17, (i * 5 + 3) % 17))
    assert(run(rand, 4) === bruteForce(rand, 4))
  }

  test("nb and rsum are monotone in radius; a sink node never grows") {
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 2L), (5L, 5L), (6L, 1L))
    val out = run(edges, 4)
    val nodes = out.keys.map(_._1).toSet
    for (n <- nodes; r <- 1 to 4) {
      val (nbPrev, rsPrev) = out((n, r - 1))
      val (nb, rs) = out((n, r))
      assert(nb >= nbPrev && rs >= rsPrev, s"node $n radius $r must not shrink")
    }
    // 3 has no out-edges: its ball is {3} at every radius
    for (r <- 0 to 4) assert(out((3L, r)) === out((3L, 0)))
  }

  test("ball saturation: on a strongly-connected cycle every node reaches everything") {
    val n = 5
    val cycle = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
    val out = run(cycle, n - 1)
    val full = out.collect { case ((_, r), s) if r == n - 1 => s }.toSet
    assert(full.size === 1, "all nodes sketch the identical full vertex set")
    // and that shared sketch IS the sketch of the whole vertex set
    val allNodes = (0 until n).flatMap(i => (0 until n).map(m => (i.toLong, m.toLong)))
    val whole = HllSketch.registers(allNodes.toDF("node", "member"),
        Seq("node"), col("member"))
      .groupBy("node").agg(count(lit(1)).as("nb"), sum("r").as("rsum"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(whole === full)
  }

  test("harmonic estimates track exact BFS harmonic centrality within 5%") {
    // directed path 1→2→3→4→5 plus a shortcut 1→3: exact distances known
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L))
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    def dists(src: Long): Map[Long, Int] = {
      var d = Map(src -> 0); var frontier = Set(src); var k = 0
      while (frontier.nonEmpty) {
        k += 1
        frontier = frontier.flatMap(m => adj.getOrElse(m, Set.empty)).filterNot(d.contains)
        d ++= frontier.map(_ -> k)
      }
      d
    }
    val exact = nodes.map(v =>
      v -> dists(v).collect { case (u, dd) if u != v => 1.0 / dd }.sum).toMap
    val est = HyperBall.harmonic(edges.toDF("src", "dst"), rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    nodes.foreach { v =>
      val (e0, h) = (exact(v), est(v))
      assert(math.abs(h - e0) <= math.max(0.05 * e0, 0.06),
        s"node $v: estimate $h vs exact $e0")
    }
    // the ordering signal survives the estimation: 1 reaches everything
    assert(est(1L) > est(4L) && est(4L) > est(5L))
  }

  test("partitioning-independent") {
    val edges = (0L until 200L).map(i => (i % 23, (i * 7 + 2) % 23))
    val a = run(edges, 3)
    val b = HyperBall.neighborhoods(edges.toDF("src", "dst").repartition(13), 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(a === b)
  }
}
