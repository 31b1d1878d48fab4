package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Closed-form and invariance checks for the integer-exact SALSA
  * fixpoint. The tiny bipartite graph's scores are derived by hand from
  * the recurrence (unit = 10^12, N = 5, h0 = 2·10^11). */
class SalsaSpec extends SparkSpec {
  import testImplicits._

  // hubs {1,2} -> authorities {10,11,12}; 11 is co-cited by both hubs
  private def edges = Seq(
    (1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L)
  ).toDF("src", "dst")

  test("one iteration matches the hand-derived recurrence") {
    val out = Salsa.scores(edges, iters = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val h0 = 1000000000000L / 5
    // a1(10) = h0//2, a1(11) = 2*(h0//2), a1(12) = h0//2
    assert(out(10L)._2 == h0 / 2)
    assert(out(11L)._2 == 2 * (h0 / 2))
    assert(out(12L)._2 == h0 / 2)
    // hubs have no in-links: auth 0; authorities have no out-links: hub 0
    assert(out(1L)._2 == 0 && out(2L)._2 == 0)
    assert(out(10L)._1 == 0 && out(11L)._1 == 0 && out(12L)._1 == 0)
    // h1(1) = a1(10)//1 + a1(11)//2, symmetric for 2
    val expectH = h0 / 2 + (2 * (h0 / 2)) / 2
    assert(out(1L)._1 == expectH && out(2L)._1 == expectH)
  }

  test("co-citation concentrates authority; mass stays bounded by unit") {
    val out = Salsa.scores(edges, iters = 6).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(11L)._2 > out(10L)._2, "co-cited node must rank higher")
    assert(out(10L)._2 == out(12L)._2, "symmetric authorities must tie")
    // local normalization conserves mass up to floor loss: never grows
    assert(out.values.map(_._1).sum <= 1000000000000L)
    assert(out.values.map(_._2).sum <= 1000000000000L)
  }

  test("partition-independent: repartitioned input gives identical scores") {
    val a = Salsa.scores(edges, iters = 4).orderBy("node").collect().toSeq
    val b = Salsa.scores(edges.repartition(7), iters = 4)
      .orderBy("node").collect().toSeq
    assert(a == b)
  }

  test("self-loops and duplicate edges are ignored") {
    val noisy = edges
      .unionAll(Seq((1L, 10L), (5L, 5L)).toDF("src", "dst"))
    val a = Salsa.scores(noisy, iters = 3).orderBy("node").collect().toSeq
    val b = Salsa.scores(edges, iters = 3).orderBy("node").collect().toSeq
    assert(a == b)
  }
}
