package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer-exact systematic PPS sampling: closed-form threshold
  * crossings, proportionality, and the distributed prefix sum's
  * equality with the naive global formulation. */
class PpsSampleSpec extends SparkSpec {
  import testImplicits._

  test("selection is exactly the threshold-crossing rule") {
    // weights 10,10,10,10 with n=2: W=40, step=20; thresholds at 20, 40
    // cross inside docs 2 (cum 20) and 4 (cum 40)
    val docs = (1L to 4L).map((_, 10L)).toDF("doc_id", "wt")
    val out = PpsSample.systematic(docs, "doc_id", col("wt"), n = 2)
      .orderBy("id").collect()
    assert(out.map(_.getAs[Boolean]("selected")).toSeq ==
      Seq(false, true, false, true))
    assert(out.map(_.getAs[Long]("cum_w")).toSeq == Seq(10L, 20L, 30L, 40L))
  }

  test("a heavy row crosses several thresholds: multiplicity reported") {
    // W=100, n=10, step=10; doc 2 (w=55, cum 60) covers thresholds
    // 10..60 minus doc 1's (5: none) -> 6 picks
    val docs = Seq((1L, 5L), (2L, 55L), (3L, 40L)).toDF("doc_id", "wt")
    val out = PpsSample.systematic(docs, "doc_id", col("wt"), n = 10)
      .orderBy("id").collect()
    assert(out(0).getAs[Long]("n_picks") == 0L)
    assert(out(1).getAs[Long]("n_picks") == 6L)
    assert(out(2).getAs[Long]("n_picks") == 4L)
  }

  test("zero and NULL weights are never selected, rows never dropped") {
    val docs = Seq((1L, Some(0L)), (2L, None), (3L, Some(7L)))
      .toDF("doc_id", "wt")
    val out = PpsSample.systematic(docs, "doc_id", col("wt"), n = 1)
      .orderBy("id").collect()
    assert(out.length == 3)
    assert(!out(0).getAs[Boolean]("selected"))
    assert(!out(1).getAs[Boolean]("selected"))
    assert(out(2).getAs[Boolean]("selected"))
  }

  test("chunked prefix sum equals the naive global cumulative") {
    val docs = (0L until 3000L).map(i => (i, (i * 7919) % 100 + 1))
      .toDF("doc_id", "wt")
    // tiny chunks force MANY chunk boundaries through the offset path
    val chunked = PpsSample.systematic(docs, "doc_id", col("wt"), n = 50,
        chunkBits = 4)
      .orderBy("id").collect().map(r =>
        (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    val global = PpsSample.systematic(docs, "doc_id", col("wt"), n = 50,
        chunkBits = 62)
      .orderBy("id").collect().map(r =>
        (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    assert(chunked == global)
    // ~n rows selected, proportionality: total picks == n when step divides
    val picks = chunked.map(_._3).sum
    assert(picks >= 49 && picks <= 51, s"expected ~50 picks, got $picks")
  }

  test("deterministic under repartitioning") {
    val docs = (0L until 500L).map(i => (i, i % 13 + 1)).toDF("doc_id", "wt")
    val a = PpsSample.systematic(docs, "doc_id", col("wt"), n = 20)
      .orderBy("id").collect().toSeq
    val b = PpsSample.systematic(docs.repartition(11), "doc_id", col("wt"),
        n = 20)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }
}
