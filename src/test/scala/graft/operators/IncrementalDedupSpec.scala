package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental dedup: planted positives/negatives, agreement with the
  * full self-dedup on cross-split pairs, and empty-increment behavior. */
class IncrementalDedupSpec extends SparkSpec {
  import testImplicits._

  test("a near-copy of an index doc is found; an unrelated doc is not") {
    val history = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely different text about distributed query engines and shuffles"))
      .toDF("doc_id", "text")
    val increment = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again today extra"),
      (11L, "unrelated fresh content with no overlap whatsoever in any shingle"))
      .toDF("doc_id", "text")
    val index = IncrementalDedup.signatureIndex(history, "text", "doc_id")
    val out = IncrementalDedup.newVersusIndex(increment, "text", "doc_id", index)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((10L, 1L)), "planted near-copy must collide with its original")
    assert(!out.exists(_._1 == 11L), "unrelated increment doc must not match")
  }

  test("agrees with the full self-dedup on cross-split pairs (real sf0.001 docs)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val planted = docs.unionAll(docs.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" graftdup")).as("text")))
    val history = planted.where(col("doc_id") < 1000000L)
    val increment = planted.where(col("doc_id") >= 1000000L)
    val incr = IncrementalDedup.newVersusIndex(increment, "text", "doc_id",
        IncrementalDedup.signatureIndex(history, "text", "doc_id"), minEst = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the same banding over the union finds the same cross-split pairs
    val full = Dedup.minHashPairs(planted, "text", "doc_id")
      .where(col("left_id") < 1000000L && col("right_id") >= 1000000L &&
        col("est_jaccard") >= 0.5)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
    assert(incr === full)
    assert(incr.nonEmpty, "planted near-copies must produce cross-split pairs")
  }

  test("empty increment yields an empty result") {
    val history = Seq((1L, "some history document text here")).toDF("doc_id", "text")
    val empty = history.where(lit(false))
    val out = IncrementalDedup.newVersusIndex(empty, "text", "doc_id",
      IncrementalDedup.signatureIndex(history, "text", "doc_id"))
    assert(out.count() === 0)
  }
}
