package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D4 on a stream: idempotent event admission. The batch pipeline dedups
  * events by content hash (P13 — `ReferenceFunctions.eventId`); on a
  * stream the same guarantee comes from `dropDuplicatesWithinWatermark`,
  * which keeps the FIRST occurrence of each key and holds per-key state
  * only until the watermark passes — bounded state, unlike a plain
  * `dropDuplicates` whose state grows forever.
  *
  * Scale shape: one shuffle on the dedup key; state size tracks the
  * distinct keys per watermark horizon, not stream history.
  */
object StreamDedup {

  /** Drop re-deliveries of the same event (identified by `keyCols`)
    * arriving within `delay` of first sight. */
  def withinWatermark(events: DataFrame, tsCol: String,
                      keyCols: Seq[String],
                      delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)
}
