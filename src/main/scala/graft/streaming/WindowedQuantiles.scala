package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.QuantileSketch

/** Windowed approximate quantiles over an unbounded stream via the
  * log-linear sketch — per-window latency/size/length percentiles
  * where an exact streaming percentile would hold every value in
  * state. Completes the streaming sketch TRIO (WindowedDistinct =
  * distincts, WindowedFrequency = frequencies, this = order
  * statistics): state per open window is AT MOST 16·63+1 bucket rows,
  * watermark-bounded.
  *
  * The emitted rows ARE the mergeable sketch (window_start,
  * window_end, bucket, c) in append mode once the watermark closes
  * the window: downstream rolls windows up by bucket-wise sum
  * ([[QuantileSketch.rollup]]) and reads any percentile off any slice
  * with [[QuantileSketch.quantiles]] — never re-reading events.
  * Batch/stream parity: the same pure-integer bucket bit contract as
  * the batch sketch (the t66 oracle gates those bits vs DuckDB),
  * asserted bucket-identical in the spec. */
object WindowedQuantiles {

  /** (window_start, window_end, bucket, c) per tumbling window. NULL
    * and negative values are skipped (the batch-sketch contract). */
  def tumbling(
      events: DataFrame,
      tsCol: String,
      value: org.apache.spark.sql.Column,
      windowLength: String = "10 minutes",
      watermark: String = "5 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .where(value.isNotNull && value >= 0)
      .select(col(tsCol), QuantileSketch.bucketCol(value).as("bucket"))
      .groupBy(window(col(tsCol), windowLength), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("bucket"), col("c"))
}
