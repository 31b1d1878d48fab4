package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.HllSketch

/** Windowed approximate-distinct over an unbounded stream via the HLL
  * register sketch — distinct users/URLs/tokens per time window where
  * exact streaming `countDistinct` would hold every value in state.
  * State per open window is AT MOST m=256 register rows (one per
  * non-empty bucket), watermark-bounded like every windowed aggregate:
  * the sketch turns unbounded-cardinality state into a fixed-size
  * table, which is precisely why sketches exist in streams.
  *
  * The emitted rows ARE the mergeable sketch (window_start,
  * window_end, bucket, r) in append mode once the watermark closes the
  * window — the streaming-native output: downstream consumers roll
  * windows up with [[HllSketch.rollup]] (register-wise max) to hours /
  * days / global without re-reading events, or read a count off any
  * slice with [[HllSketch.estimate]]. Batch/stream parity: the same
  * bucket/rank bit contract as the batch sketch, asserted register-
  * identical in the spec (the t64 oracle gates those bits vs DuckDB). */
object WindowedDistinct {

  /** (window_start, window_end, bucket, r) per tumbling window. */
  def tumbling(
      events: DataFrame,
      tsCol: String,
      value: org.apache.spark.sql.Column,
      windowLength: String = "10 minutes",
      watermark: String = "5 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .where(value.isNotNull)
      .select(col(tsCol),
        HllSketch.bucketCol(value).as("bucket"),
        HllSketch.rankCol(value).as("r"))
      .groupBy(window(col(tsCol), windowLength), col("bucket"))
      .agg(max(col("r")).as("r"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("bucket"), col("r"))
}
