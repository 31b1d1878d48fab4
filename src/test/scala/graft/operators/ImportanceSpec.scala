package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance weights: sign/direction of the LR signal, empty-doc
  * contract, length normalization, and the broadcast-scorer plan. */
class ImportanceSpec extends SparkSpec {
  import testImplicits._

  private val docs = Seq(
    (1L, "alpha alpha beta", true),   // target-like vocabulary
    (2L, "alpha beta beta", true),
    (3L, "alpha beta", false),        // raw doc made of target words
    (4L, "gamma delta gamma", false), // raw doc with non-target words
    (5L, "", false))                  // empty
    .toDF("doc_id", "text", "tgt")

  private def run() = Importance.dsirWeights(
      docs, "doc_id", "text", targetPred = col("tgt"))
    .collect()
    .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap

  test("target-vocabulary docs weigh above non-target docs; empty doc is 0") {
    val out = run()
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L), "every doc survives")
    assert(out(3L)._1 > out(4L)._1,
      "doc of target words must outweigh doc of non-target words")
    assert(out(4L)._1 < 0.0, "never-in-target vocabulary → negative LR")
    assert(out(5L) === ((0.0, 0L)), "empty doc: weight 0, no tokens")
  }

  test("weight is length-normalized: duplicating a doc's text preserves it") {
    val base = Seq((1L, "alpha beta", true), (2L, "gamma delta", false),
      (3L, "alpha beta", false),
      (4L, "alpha beta alpha beta alpha beta", false))
      .toDF("doc_id", "text", "tgt")
    val out = Importance.dsirWeights(base, "doc_id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(3L) === out(4L),
      "3x-repeated same-distribution text must keep the same weight")
  }

  test("token counts come back per doc; n_tokens matches corpus") {
    val out = run()
    assert(out(1L)._2 === 3L && out(3L)._2 === 2L && out(4L)._2 === 3L)
  }

  test("plan: log-ratio table broadcasts — only doc-keyed shuffles") {
    val big = spark.range(2000).select(col("id").as("doc_id"),
      concat(lit("w"), (col("id") % 50).cast("string"),
        lit(" w"), (col("id") % 7).cast("string")).as("text"),
      (col("id") % 10 === 0).as("tgt"))
    val df = Importance.dsirWeights(big, "doc_id", "text", col("tgt"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the 256-row lr table must broadcast into the per-doc scorer")
  }
}
