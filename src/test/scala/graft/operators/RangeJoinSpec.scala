package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketized interval join: containment semantics (half-open bounds,
  * bucket-boundary spans), degenerate/null intervals, equivalence with
  * the naive non-equi join, and the equi-join plan. */
class RangeJoinSpec extends SparkSpec {
  import testImplicits._

  test("half-open containment across bucket boundaries") {
    val pts = Seq((1L, 1L, 5L), (2L, 1L, 10L), (3L, 1L, 24L), (4L, 1L, 25L))
      .toDF("id", "k", "pt")
    // interval [10, 25) spans buckets 1..2 at width 10
    val ivs = Seq((1L, 10L, 25L, "a")).toDF("k", "lo", "hi", "tag")
    val out = RangeJoin.interval(pts, ivs, Seq("k"), "pt", "lo", "hi",
        bucketWidth = 10L)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq === Seq(2L, 3L))  // 5 below, 25 == hi excluded
  }

  test("degenerate and null intervals match nothing") {
    val pts = Seq((1L, 1L, 5L)).toDF("id", "k", "pt")
    val ivs = Seq((Some(1L), Some(5L), Some(5L), Some("empty")),
      (Some(1L), Some(7L), Some(3L), Some("inverted")),
      (Some(1L), Option.empty[Long], Some(9L), Some("null-lo")))
      .toDF("k", "lo", "hi", "tag")
    assert(RangeJoin.interval(pts, ivs, Seq("k"), "pt", "lo", "hi", 10L)
      .count() === 0L)
  }

  test("agrees with the naive non-equi join on random data") {
    val pts = spark.range(500).select(col("id"), (col("id") % 7).as("k"),
      ((col("id") * 131) % 1000).as("pt"))
    val ivs = spark.range(60).select((col("id") % 7).as("k"),
      ((col("id") * 37) % 900).as("lo"),
      (((col("id") * 37) % 900) + (col("id") % 5) * 40).as("hi"),
      col("id").as("iv_id"))
    val fast = RangeJoin.interval(pts, ivs, Seq("k"), "pt", "lo", "hi", 50L)
    val naive = pts.join(ivs, Seq("k"))
      .filter(col("pt") >= col("lo") && col("pt") < col("hi"))
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("interval wider than maxBuckets fails loudly instead of exploding") {
    val pts = Seq((1L, 1L, 5L)).toDF("id", "k", "pt")
    // sentinel hi near Long.MaxValue: would explode ~9e17 rows unchecked
    val ivs = Seq((1L, 0L, Long.MaxValue - 1, "corrupt"))
      .toDF("k", "lo", "hi", "tag")
    val ex = intercept[Exception] {
      RangeJoin.interval(pts, ivs, Seq("k"), "pt", "lo", "hi",
        bucketWidth = 10L).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("maxBuckets")),
      s"expected the raise_error message, got: ${messages(ex)}")
    // same interval passes when maxBuckets is raised to cover it, at a
    // bucketWidth that keeps the explode bounded
    val wide = RangeJoin.interval(pts, ivs, Seq("k"), "pt", "lo", "hi",
      bucketWidth = Long.MaxValue / 4, maxBuckets = 8L)
    assert(wide.count() === 1L)
  }

  test("plans as an equi-join on (key, bucket) — no nested loop, no cartesian") {
    val pts = spark.range(100).select(col("id"), (col("id") % 3).as("k"),
      (col("id") * 9).as("pt"))
    val ivs = spark.range(30).select((col("id") % 3).as("k"),
      (col("id") * 20).as("lo"), (col("id") * 20 + 35).as("hi"))
    val df = RangeJoin.interval(pts, ivs, Seq("k"), "pt", "lo", "hi", 40L)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "bucketized range join must plan as an equi-join")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
  }
}
