package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temperature-scaled data-mixture sampling: allocate a total sample
  * budget across strata (sources, languages, domains) by
  * `w_s = n_s^α / Σ n_s^α` — the standard multiplier-free way to
  * rebalance a training mixture (α = 1 keeps natural proportions,
  * α = 0 is uniform across strata, α ≈ 0.5 is the upsample-the-tail
  * compromise multilingual pretraining uses). Rows within a stratum are
  * selected by content-hash order, so the sample is reproducible across
  * runs, engines, and partitionings (same convention as the stratified
  * sample operator).
  *
  * Scale shape: one count aggregate over the corpus (the per-stratum
  * weight table is strata-sized — broadcast by construction), one
  * per-stratum rank window, one broadcast quota join. The exact-rank
  * selection serializes each stratum's ordering into one window task —
  * the oracle-able choice; at corpus scales where that matters, swap
  * the rank filter for a hash-threshold rate (keep rows whose hash
  * fraction < quota/n_s) and the plan loses the window entirely.
  *
  * Determinism note: α = 0.5 is computed via `sqrt` (IEEE-exact in
  * every engine); weights are rounded before the quota division and
  * quotas are `round`ed, so the allocation is stable cross-engine.
  * Other α values use `pow`, whose last-ulp behavior is
  * platform-dependent — fine for one engine, not for a cross-engine
  * hash oracle.
  */
object Mixture {

  def temperatureSample(df: DataFrame, strataCol: String, textCol: String,
                        idCol: String, total: Int, alpha: Double = 0.5)
      : DataFrame = {
    require(total >= 1)
    val nPow: org.apache.spark.sql.Column =
      if (alpha == 0.5) sqrt(col("n"))
      else pow(col("n").cast("double"), alpha)
    // the weight normalizer comes from a global window over the
    // strata-sized weight table (ONE subtree, one corpus aggregation) —
    // a separate `weights.agg(sum)` branch would re-run the corpus
    // count aggregate for the second reference
    val quotas = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n"))
      .select(col(strataCol), round(nPow, 4).as("w"))
      .withColumn("tot", sum(col("w")).over(Window.partitionBy()))
      .select(col(strataCol),
        round(lit(total.toDouble) * col("w") / col("tot"))
          .cast("long").as("quota"))

    // nulls-last on the hash key: Spark's ASC default is NULLS FIRST,
    // DuckDB's is NULLS LAST — a NULL text row must rank the same in both
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(textCol)).asc_nulls_last, col(idCol))
    df.select(col(idCol), col(strataCol), col(textCol))
      .withColumn("rn", row_number().over(w))
      .join(broadcast(quotas), Seq(strataCol))
      .filter(col("rn") <= col("quota"))
      .select(col(idCol), col(strataCol), col("rn"), col("quota"))
  }
}
