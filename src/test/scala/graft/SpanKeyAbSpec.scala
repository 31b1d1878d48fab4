package graft

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The span-key A/B tool's honesty rests on its two arms being the
  * PRODUCTION `duplicateSpans` plan with only the key expression
  * swapped — these specs pin that claim so a future SpanDedup change
  * cannot silently diverge the probe from the operator it measures. */
class SpanKeyAbSpec extends SparkSpec {
  import testImplicits._

  private def docs = Seq(
    (0L, "a b c d e f g h i j k l"),
    (1L, "a b c d e f g h i j z z"),   // shares doc 0's first 10-window
    (2L, "one two three"),             // shorter than the window
    (3L, "")).toDF("doc_id", "text")

  test("xxhash64 arm reproduces SpanDedup.duplicateSpans exactly") {
    val arm = SpanKeyAb.profile(docs, g => xxhash64(g))
      .orderBy("doc_id").collect()
    val prod = graft.operators.SpanDedup.duplicateSpans(docs)
      .orderBy("doc_id").collect()
    assert(arm.toSeq == prod.toSeq)
  }

  test("md5 arm agrees with the xxhash64 arm on every profile row") {
    val xx = SpanKeyAb.profile(docs, g => xxhash64(g))
      .orderBy("doc_id").collect()
    val md = SpanKeyAb.profile(docs, g => md5(g))
      .orderBy("doc_id").collect()
    assert(xx.toSeq == md.toSeq)
  }
}
