package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Per-stratum vocabulary statistics — the corpus-QA report every
  * curation pipeline prints before/after filtering: token volume, type
  * (distinct-word) count, hapax-legomena count (words seen exactly
  * once), and type-token ratio. A collapsing TTR or hapax share is the
  * cheap tell for template/boilerplate corpora; a ballooning one for
  * OCR noise — the aggregate view behind the per-document signals
  * (t17/t32/t39).
  *
  * Scale shape: one exploded token pass → (stratum, word) counts with
  * map-side partial aggregation (vocabulary-sized, not corpus-sized),
  * then a stratum-keyed rollup of that count table. Exact distinct
  * counts are the oracle-able default; at 100 TB swap the rollup input
  * for `approx_count_distinct` on the token stream and drop the hapax
  * column (HyperLogLog can't see "exactly once") — the same
  * exact-by-default / approximate-at-scale convention as the extended
  * stats operator (A5).
  */
object CorpusStats {

  /** One row per stratum: (stratum, n_tokens, n_types, n_hapax,
    * type_token_ratio rounded to 4 dp). */
  def vocabularyReport(
      docs: DataFrame,
      strataCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val tf = docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(strataCol).as("stratum"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("t"))
      .groupBy(col("stratum"), col("t"))
      .agg(count(lit(1)).as("c"))

    tf.groupBy(col("stratum"))
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("stratum"), col("n_tokens"), col("n_types"), col("n_hapax"),
        round(col("n_types") / col("n_tokens").cast("double"), 4)
          .as("type_token_ratio"))
  }
}
