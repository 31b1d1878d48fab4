package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sinks.KvSink

/** K3 in streaming form: publish each micro-batch of windowed channel
  * stats ([[WindowedStats.tumbling]] output) as TTL'd KV hashes —
  * `stats:<window-start>` → `{sensor}:{stat}` fields, the same key shape
  * the per-file path writes (udbf_file_analysis.py:69-83), so
  * register-map consumers (J1) read both identically.
  *
  * foreachBatch + update mode: a window's hash is overwritten as late
  * data refines it (hset is idempotent per field), and TTL retires
  * windows nobody refreshed — the reference's expiry contract. */
object KvStatsSink {

  /** `maxBatchRows` is the control-plane cardinality contract for the
    * per-batch collect: one row per (window, sensor) per trigger. The
    * default covers thousands of sensors across the handful of windows a
    * trigger can touch; a stream that exceeds it is publishing data, not
    * stats, and fails loudly rather than flooding the driver.
    *
    * Fail-loud consequence: the guard throws INSIDE foreachBatch, which
    * TERMINATES the streaming query (it does not skip the batch). That
    * is deliberate — a silent partial publish would leave stale stats
    * under fresh TTLs — but it means `maxBatchRows` must be sized for
    * the WORST-CASE batch, which is backlog replay after downtime:
    * sensors × windows covered by the catch-up interval, not by one
    * trigger. The default (100k) absorbs e.g. 1k sensors × a full day
    * of 10-min windows; restart-after-longer-outage deployments should
    * raise it (or bound replay with `maxFilesPerTrigger` upstream). */
  def start(windowed: DataFrame, kv: KvSink, checkpointDir: String,
      ttlSeconds: Long = graft.core.GraftConfig.basicTtlSeconds,
      trigger: String = s"${graft.core.GraftConfig.tickerIntervalSec} seconds",
      maxBatchRows: Int = 100000)
      : StreamingQuery =
    windowed.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(trigger))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // control-plane collect: one row per (window, sensor) per batch
        graft.core.Bounded.collect(batch, maxBatchRows, "KvStatsSink.batch")
          .groupBy(_.getTimestamp(0)).foreach {
          case (windowStart, rows) =>
            val key = "stats:" + windowStart.toInstant.toString
            val mapping = rows.flatMap { r =>
              val sensor = r.getString(2)
              Seq(s"$sensor:mean" -> r.getDouble(3).toString,
                s"$sensor:min" -> r.getDouble(4).toString,
                s"$sensor:max" -> r.getDouble(5).toString)
            }.toMap
            if (mapping.nonEmpty) kv.hset(key, mapping, Some(ttlSeconds))
        }
      }
      .start()
}
