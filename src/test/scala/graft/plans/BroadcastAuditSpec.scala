package graft.plans

import graft.{BroadcastAudit, SparkSpec}
import org.apache.spark.sql.functions._

/** Proves the BroadcastAudit failing check actually fails: a PLANTED
  * aggregate-over-explode build side, statically priced small enough
  * to broadcast, must be truth-counted and verdict FAIL when its
  * deserialized size exceeds the bound — the exact t42 class
  * (estimate under threshold, truth over it). The report path
  * (round 14) could only catch the next t42 if a human re-read 138
  * audit lines with the right suspicion; this spec pins the check. */
class BroadcastAuditSpec extends SparkSpec {
  import testImplicits._

  /** docs whose exploded token domain aggregates to a word-stats frame
    * that Catalyst prices tiny (Aggregate shrinks the estimate) and
    * statically broadcasts into the probe join. */
  private def plantedQuery = {
    val docs = (1 to 200)
      .map(i => (i.toLong, s"tok${i % 50} tok${(i * 7) % 50} tok${(i * 13) % 50}"))
      .toDF("doc_id", "text")
    val wordStats = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("df"))
    val probe = docs.select(explode(split(col("text"), " ")).as("w"),
      col("doc_id"))
    probe.join(wordStats, "w")
  }

  test("planted agg-over-explode broadcast build is flagged and truth-counted") {
    val reports = BroadcastAudit.auditQuery(
      spark, "planted", plantedQuery, boundBytes = Long.MaxValue)
    val flagged = reports.filter(_.sig == "AGG_OVER_EXPLODE")
    assert(flagged.nonEmpty,
      s"planted build not flagged — reports: ${reports.map(_.line)}")
    // truth count = 50 distinct tokens, counted not estimated
    assert(flagged.exists(_.trueRows == 50L),
      s"expected trueRows=50, got ${flagged.map(_.trueRows)}")
    assert(flagged.forall(_.verdict == "PASS"))
  }

  test("the same build FAILS when truth exceeds the bound") {
    // bound of 1 byte: any non-empty truth-counted build is over it —
    // the planted analogue of t42's 45 M rows vs a 64 MB estimate
    val reports = BroadcastAudit.auditQuery(
      spark, "planted", plantedQuery, boundBytes = 1L)
    val flagged = reports.filter(_.sig == "AGG_OVER_EXPLODE")
    assert(flagged.nonEmpty && flagged.exists(_.verdict == "FAIL"),
      s"bound=1 must fail the planted build: ${reports.map(_.line)}")
  }

  test("benign dimension-table broadcast is reported est-only, never counted") {
    val facts = (1 to 100).map(i => (i.toLong, i % 5)).toDF("id", "dim_id")
    val dims = (0 until 5).map(i => (i, s"dim$i")).toDF("dim_id", "name")
    val reports = BroadcastAudit.auditQuery(
      spark, "benign", facts.join(broadcast(dims), "dim_id"), boundBytes = 1L)
    assert(reports.nonEmpty, "expected a broadcast build side")
    assert(reports.forall(r => r.sig == "ok" && r.verdict == "-" &&
      r.trueRows == -1L), s"benign build must not pay a count: " +
      s"${reports.map(_.line)}")
  }

  /** size model sanity: monotone in rows and schema width. */
  test("deserializedBytes model is monotone") {
    import org.apache.spark.sql.types._
    val narrow = StructType(Seq(StructField("a", LongType)))
    val wide = StructType(Seq(StructField("a", LongType),
      StructField("b", StringType), StructField("c", DoubleType)))
    assert(BroadcastAudit.deserializedBytes(10, narrow) <
      BroadcastAudit.deserializedBytes(20, narrow))
    assert(BroadcastAudit.deserializedBytes(10, narrow) <
      BroadcastAudit.deserializedBytes(10, wide))
  }
}
