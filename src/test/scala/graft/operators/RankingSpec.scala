package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 semantics: hand-computed scores, idf monotonicity, length
  * normalization, and the scale-safe top-k plan. */
class RankingSpec extends SparkSpec {
  import testImplicits._

  test("matches a hand-computed BM25 score") {
    // corpus: 3 docs, query = {x}. df(x)=2, N=3, dl = 2,4,2; avgdl = 8/3
    val docs = Seq((1L, "x y"), (2L, "x x z w"), (3L, "p q"))
      .toDF("doc_id", "text")
    val out = Ranking.bm25(docs, "doc_id", "text", Seq("x"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    def s(tf: Int, dl: Int): Double = {
      val raw = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (8.0 / 3.0)))
      BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out.keySet === Set(1L, 2L))  // doc 3 matches nothing
    assert(out(1L) === s(1, 2))
    assert(out(2L) === s(2, 4))
  }

  test("rarer terms score higher; longer docs are penalized") {
    val docs = Seq(
      (1L, "rare common a b"), (2L, "common a b c"),
      (3L, "common a b c d e f g h i j k l m n o p q r s t u v w"),
      (4L, "common x y z")).toDF("doc_id", "text")
    val out = Ranking.bm25(docs, "doc_id", "text",
        Seq("rare", "common"), topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) > out(2L), "doc with the rare term must outrank")
    assert(out(2L) > out(3L), "longer doc with same tf must score lower")
  }

  test("topK bounds output; ranks are dense from 1") {
    val docs = spark.range(100).select(col("id").as("doc_id"),
      concat(lit("q term filler"), (col("id") % 7).cast("string"))
        .as("text"))
    val out = Ranking.bm25(docs, "doc_id", "text", Seq("q"), topK = 5)
      .orderBy("rank").collect()
    assert(out.length === 5)
    assert(out.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2, 3, 4, 5))
  }

  test("plan: df/corpus broadcast, top-k via TakeOrdered — no global sort of all docs") {
    val docs = spark.range(500).select(col("id").as("doc_id"),
      concat(lit("spark join word"), (col("id") % 11).cast("string")).as("text"))
    val df = Ranking.bm25(docs, "doc_id", "text", Seq("spark", "join"), topK = 10)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "tiny df/corpus aggregates must broadcast")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-k must be TakeOrderedAndProject, not a global window")
  }
}
