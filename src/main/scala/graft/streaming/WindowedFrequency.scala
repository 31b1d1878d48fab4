package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.CmsSketch

/** Windowed approximate frequencies over an unbounded stream via the
  * count–min sketch — per-window token/URL/user counts where an exact
  * streaming `groupBy(value).count` would hold every distinct value in
  * state. State per open window is AT MOST Depth·Width = 16 384
  * counter rows, watermark-bounded — the frequency sibling of
  * [[WindowedDistinct]] (distincts), completing the streaming sketch
  * pair.
  *
  * The emitted rows ARE the mergeable sketch (window_start,
  * window_end, j, idx, c) in append mode once the watermark closes the
  * window: downstream consumers merge windows by summing counters
  * ([[CmsSketch.merge]] semantics), answer point queries with
  * [[CmsSketch.estimate]], or run the heavy-hitter cut — never
  * re-reading events. Batch/stream parity: the same md5 cell contract
  * as the batch sketch (the t65 oracle gates those bits vs DuckDB),
  * asserted cell-identical in the spec. */
object WindowedFrequency {

  /** (window_start, window_end, j, idx, c) per tumbling window. */
  def tumbling(
      events: DataFrame,
      tsCol: String,
      value: org.apache.spark.sql.Column,
      windowLength: String = "10 minutes",
      watermark: String = "5 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .where(value.isNotNull)
      .select(col(tsCol), explode(CmsSketch.cellsCol(value)).as("cell"))
      .select(col(tsCol), col("cell.j").as("j"), col("cell.idx").as("idx"))
      .groupBy(window(col(tsCol), windowLength), col("j"), col("idx"))
      .agg(count(lit(1)).as("c"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("j"), col("idx"), col("c"))
}
