package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Systematic probability-proportional-to-size sampling — the
  * quality-WEIGHTED counterpart of the uniform stratified sample (t22)
  * and the source-mixture sample (t30): draw ~n documents with
  * inclusion probability proportional to an integer weight (a scaled
  * quality score, a token count, an importance weight), the classic
  * survey-sampling estimator (Madow 1949) that data-curation recipes
  * reach for when "sample more of the good documents" must stay
  * reproducible. With integer weights the whole procedure is
  * INTEGER-EXACT: cumulative weight C_i in id order, step = max(1,
  * W div n), and a document is selected iff its cumulative interval
  * (C_{i-1}, C_i] crosses a multiple of step — no RNG, no floats, so
  * engine and oracle agree bit-for-bit (the t62 discipline applied to
  * sampling). A weight ≥ step can cross several thresholds: n_picks
  * reports the multiplicity (PPS-with-replacement semantics preserved
  * for downstream weighting).
  *
  * Scale shape — the naive `sum(w) OVER (ORDER BY id)` is one global
  * partition: a scale-killer. This is the t44 distributed prefix sum
  * reduced to its two-level form: chunk = id >> chunkBits (monotone in
  * id), chunk totals + their running offsets computed on the BOUNDED
  * chunk table (corpus/2^chunkBits rows, partition-less window over
  * totals only), and the within-chunk running sum a window partitioned
  * by chunk (≤ 2^chunkBits rows per task). The chunk join and the
  * final window share the chunk key, so one exchange serves both. */
object PpsSample {

  /** (id, w, cum_w, n_picks, selected) for EVERY input row — callers
    * filter on `selected` (a sampler must show its work: inclusion is
    * auditable only with the cumulative interval visible). `weight`
    * must be a non-negative integral column; zero-weight rows are
    * never selected. */
  def systematic(docs: DataFrame, idCol: String, weight: Column, n: Int,
                 chunkBits: Int = 20): DataFrame = {
    require(n >= 1, s"sample size must be >= 1, got $n")
    require(chunkBits >= 0 && chunkBits < 63,
      s"chunkBits must be in [0, 63), got $chunkBits")
    // NULL weight = 0 (a sampler must not drop or poison rows)
    val base = docs.select(col(idCol).as("id"),
        coalesce(weight.cast("long"), lit(0L)).as("w"))
      .withColumn("chunk",
        coalesce(shiftright(col("id"), chunkBits), lit(Long.MinValue)))

    // bounded chunk-totals table: running offset of earlier chunks plus
    // the grand total, both as windows over corpus/2^chunkBits rows
    val wOff = Window.orderBy(col("chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = base.groupBy(col("chunk")).agg(sum(col("w")).as("ctot"))
      .withColumn("coff", coalesce(sum(col("ctot")).over(wOff), lit(0L)))
      .withColumn("tot", sum(col("ctot")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("chunk"), col("coff"), col("tot"))

    val wIn = Window.partitionBy(col("chunk")).orderBy(col("id"))
    base.join(offs, Seq("chunk"))
      .withColumn("cum_w", col("coff") + sum(col("w")).over(wIn))
      .withColumn("step", greatest(expr(s"tot div $n"), lit(1L)))
      .select(col("id"), col("w"), col("cum_w"),
        (expr("cum_w div step") - expr("(cum_w - w) div step"))
          .as("n_picks"))
      .withColumn("selected", col("n_picks") >= 1)
  }
}
