package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom-prefiltered decontamination: exact-result parity with the
  * broadcast semi-join, planted contamination recall, no-false-negative
  * guarantee of the sketch probe, and codegen of the probe kernel. */
class BloomDecontaminateSpec extends SparkSpec {
  import testImplicits._

  private def realDocs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("result is identical to the exact broadcast computation") {
    val docs = realDocs
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val viaBloom = Dedup.bloomDecontaminate(docs, bench, "text", "doc_id")
    val benchNg = bench.select(
      explode(graft.functions.TextFunctions.shingles(col("text"), 8)).as("ng"))
      .distinct()
    val exactFlag = docs
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.shingles(col("text"), 8)).as("ng"))
      .join(broadcast(benchNg), Seq("ng"), "left_semi")
      .select(col("doc_id")).distinct().withColumn("__c", lit(true))
    val exact = docs.select(col("doc_id")).join(exactFlag, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("__c"), lit(false)).as("contaminated"))
    assert(viaBloom.exceptAll(exact).isEmpty && exact.exceptAll(viaBloom).isEmpty)
  }

  test("planted 8-gram overlap is flagged; disjoint docs are not") {
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    val docs = Seq(
      (1L, s"$shared and some trailing text"),   // contains the bench 8-gram
      (2L, "totally different words with no overlap at all here"),
      (10L, s"prefix words then $shared")        // bench doc itself
    ).toDF("doc_id", "text")
    val bench = docs.filter($"doc_id" === 10L)
    val out = Dedup.bloomDecontaminate(docs, bench, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out === Map(1L -> true, 2L -> false, 10L -> true))
  }

  test("empty benchmark flags nothing") {
    val docs = Seq((1L, "some words here")).toDF("doc_id", "text")
    val out = Dedup.bloomDecontaminate(docs, docs.filter(lit(false)),
      "text", "doc_id").collect()
    assert(out.map(r => r.getLong(0) -> r.getBoolean(1)).toSeq === Seq(1L -> false))
  }

  test("sketch probe has no false negatives and is codegen'd") {
    // spark.range, not a local Seq: ConvertToLocalRelation would fold a
    // LocalRelation projection driver-side and bypass codegen entirely
    val vals = spark.range(1000).select((col("id") * 7919L).as("h"))
    val bloom = vals.stat.bloomFilter("h", 1000, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val probed = vals.select(
      call_function("graft_bloom_contains", col("h"), lit(bos.toByteArray))
        .as("hit"))
    assert(probed.filter(!col("hit")).count() === 0L, "false negative!")
    val code = probed.queryExecution.debug.codegenToSeq()
    assert(code.exists(_._2.contains("mightContainLong")),
      "probe must inline into whole-stage codegen")
  }
}
