package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Temperature-mixture sampling: quota math at the α extremes, hash-
  * order determinism, and stratum-capped selection. */
class MixtureSpec extends SparkSpec {
  import testImplicits._

  // 3 strata with counts 100 / 25 / 4
  private def corpus = {
    val rows = (0 until 100).map(i => (i.toLong, "big", s"doc b $i")) ++
      (0 until 25).map(i => (1000L + i, "mid", s"doc m $i")) ++
      (0 until 4).map(i => (2000L + i, "tiny", s"doc t $i"))
    rows.toDF("id", "src", "text")
  }

  test("alpha=0.5 quotas follow sqrt weights") {
    val out = Mixture.temperatureSample(corpus, "src", "text", "id",
      total = 50, alpha = 0.5)
    val quotas = out.select(col("src"), col("quota")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // sqrt weights 10 / 5 / 2 of 17 → 50·(10,5,2)/17 ≈ 29.4, 14.7, 5.9
    assert(quotas === Map("big" -> 29L, "mid" -> 15L, "tiny" -> 6L))
    // tiny stratum has only 4 rows — quota caps selection, not corpus
    val got = out.groupBy(col("src")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("big" -> 29L, "mid" -> 15L, "tiny" -> 4L))
  }

  test("alpha=1 keeps natural proportions, alpha=0 is uniform") {
    val natural = Mixture.temperatureSample(corpus, "src", "text", "id",
      total = 129, alpha = 1.0)
      .select(col("src"), col("quota")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(natural === Map("big" -> 100L, "mid" -> 25L, "tiny" -> 4L))
    val uniform = Mixture.temperatureSample(corpus, "src", "text", "id",
      total = 30, alpha = 0.0)
      .select(col("src"), col("quota")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uniform === Map("big" -> 10L, "mid" -> 10L, "tiny" -> 10L))
  }

  test("selection is by content-hash order and deterministic") {
    def run() = Mixture.temperatureSample(corpus, "src", "text", "id",
      total = 50, alpha = 0.5)
    assert(run().exceptAll(run()).isEmpty)
    // rn is a dense 1..n rank per stratum
    val rns = run().filter(col("src") === "mid")
      .select(col("rn")).collect().map(_.getInt(0)).sorted.toSeq
    assert(rns === (1 to rns.length))
  }
}
