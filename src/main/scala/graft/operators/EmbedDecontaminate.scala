package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-space decontamination — the semantic complement of the
  * n-gram overlap check (t24) and its Bloom-prefiltered variant (t36):
  * a training document whose EMBEDDING is near-identical to a held-out
  * benchmark item leaks the benchmark even when the n-grams differ
  * (translations, paraphrases, whitespace-mangled copies), so modern
  * pipelines run both checks before a corpus ships. Flags every corpus
  * vector whose max cosine against the benchmark set crosses the
  * near-dup threshold.
  *
  * Scale shape: the benchmark set is broadcast (held-out suites are
  * sample-sized by construction — thousands, not billions); the corpus
  * side is ONE scan with a scan-stage cosine against each benchmark
  * row, and the per-vector max collapses map-side (each corpus row's
  * pairs live in one task), so the exchange carries one thin row per
  * corpus vector. No corpus-vs-corpus pair ever forms.
  *
  * Determinism: similarities round to 4 dp before the max (rounding is
  * monotone, so max-of-rounded == rounded-max; pinning it keeps the
  * threshold comparison engine-independent — the t11/t25 convention). */
object EmbedDecontaminate {

  /** (vec_id, max_benchmark_sim, contaminated) for every corpus row.
    * An empty benchmark set contaminates nothing (max sim 0.0) — a
    * decontaminator must never drop or invent corpus rows. */
  def flag(corpus: DataFrame, bench: DataFrame, idCol: String,
           vecCol: String, threshold: Double): DataFrame = {
    val b = broadcast(bench.select(col(vecCol).as("__bv")))
    corpus.select(col(idCol).as("vec_id"), col(vecCol).as("__v"))
      .join(b, lit(true), "left")
      .select(col("vec_id"),
        round(Similarity.cosine(col("__v"), col("__bv")), 4).as("s"))
      .groupBy(col("vec_id"))
      .agg(coalesce(max(col("s")), lit(0.0)).as("max_benchmark_sim"))
      .select(col("vec_id"), col("max_benchmark_sim"),
        (col("max_benchmark_sim") >= threshold).as("contaminated"))
  }
}
