package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join semantics: >= matching, exact-timestamp visibility,
  * left-join survival, null handling, and the no-join-node plan. */
class AsOfJoinSpec extends SparkSpec {
  import testImplicits._

  private def run(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Double)]) =
    AsOfJoin.asOf(
      left.toDF("id", "k", "ts"), right.toDF("k", "ts", "v"),
      keys = Seq("k"), leftTsCol = "ts", rightTsCol = "ts",
      payload = Seq("ts", "v"))
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toMap

  test("picks the greatest right ts <= left ts, per key") {
    val out = run(
      left = Seq((1L, 7L, 10L), (2L, 7L, 25L), (3L, 7L, 5L), (4L, 9L, 25L)),
      right = Seq((7L, 8L, 0.8), (7L, 20L, 2.0), (9L, 30L, 3.0)))
    assert(out(1L) === ((Some(8L), Some(0.8))))   // 8 <= 10 < 20
    assert(out(2L) === ((Some(20L), Some(2.0))))  // latest at 25
    assert(out(3L) === ((None, None)))            // nothing at/before 5
    assert(out(4L) === ((None, None)))            // key 9: right is later
  }

  test("exact-timestamp right row is visible (>= convention)") {
    val out = run(
      left = Seq((1L, 1L, 100L)),
      right = Seq((1L, 100L, 5.0)))
    assert(out(1L) === ((Some(100L), Some(5.0))))
  }

  test("null right timestamps never match; left rows always survive") {
    val left = Seq((1L, 1L, 50L)).toDF("id", "k", "ts")
    val right = Seq((Some(1L), Option.empty[Long], Some(9.9)),
      (Some(1L), Some(40L), Some(1.1)))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out === Map(1L -> 1.1))
  }

  test("match is atomic: NULL payload from the matched row propagates, " +
    "all payload columns come from the SAME right row") {
    // right rows: ts=10 has (a=1.0, b=NULL); ts=20 has (a=NULL, b=2.0).
    // A per-column last(ignoreNulls) would stitch (a=1.0, b=2.0) from two
    // different rows; the atomic contract requires left ts=25 to see
    // ONLY the ts=20 row: (a=NULL, b=2.0).
    val left = Seq((1L, 1L, 25L), (2L, 1L, 15L)).toDF("id", "k", "ts")
    val right = Seq(
      (1L, 10L, Some(1.0), Option.empty[Double]),
      (1L, 20L, Option.empty[Double], Some(2.0)))
      .toDF("k", "ts", "a", "b")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", Seq("a", "b"))
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(out(1L) === ((None, Some(2.0))),
      "ts=25 must take BOTH columns from the ts=20 row (a genuinely NULL)")
    assert(out(2L) === ((Some(1.0), None)),
      "ts=15 must take BOTH columns from the ts=10 row (b genuinely NULL)")
  }

  test("plan has one key shuffle and no join node") {
    val left = spark.range(100).select(col("id"), (col("id") % 5).as("k"),
      (col("id") * 10).as("ts"))
    val right = spark.range(20).select((col("id") % 5).as("k"),
      (col("id") * 37).as("ts"), col("id").cast("double").as("v"))
    val df = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", Seq("v"))
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "as-of must not plan a join node")
    val shuffles = "hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(shuffles.nonEmpty && shuffles.forall(_.contains("k#")),
      s"single key-window shuffle expected, got $shuffles")
  }
}
