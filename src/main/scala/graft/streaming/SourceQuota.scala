package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming per-source admission quota — the streaming analogue of the
  * batch per-source cap (t33): admit at most `maxPerKey` documents per
  * source over the stream's lifetime (or per TTL horizon), dropping the
  * overflow at ingest instead of letting one crawler domain flood the
  * corpus.
  *
  * Built on Spark 4's `transformWithState` (the arbitrary-state API that
  * supersedes `mapGroupsWithState`): a [[StatefulProcessor]] holding ONE
  * `ValueState[Long]` counter per key. With a `ttl`, the counter is
  * dropped by the state store after that much processing time, so the
  * quota becomes "N per source per TTL window" and state cannot outlive
  * the horizon; without it, state is one long per distinct source —
  * bounded by source cardinality, not stream length, either way.
  *
  * Admission is deterministic GIVEN an arrival order (first-come wins,
  * like the batch cap's md5 order is deterministic given content);
  * within one micro-batch the per-key iterator preserves batch order.
  * Requires the RocksDB state store provider (a transformWithState
  * requirement — see [[graft.core.Sessions]] stream conf).
  *
  * Scale shape: one shuffle on the key; per-key state is a single long;
  * output is the admitted subset, emitted append-mode in the same
  * micro-batch the row arrives (no watermark latency). */
object SourceQuota {

  /** Processor: count admitted rows per key, pass rows through until
    * the quota is reached. */
  private final class QuotaProcessor(maxPerKey: Long, ttl: TTLConfig)
      extends StatefulProcessor[String, (String, Long), (String, Long)] {

    @transient private var admitted: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      admitted = getHandle.getValueState[Long]("admitted", Encoders.scalaLong, ttl)

    override def handleInputRows(key: String, rows: Iterator[(String, Long)],
                                 timerValues: TimerValues): Iterator[(String, Long)] = {
      var n = if (admitted.exists()) admitted.get() else 0L
      val out = rows.takeWhile { _ => n < maxPerKey }
        .map { r => n += 1; r }.toVector
      admitted.update(n)
      out.iterator
    }
  }

  /** Cap a document stream at `maxPerKey` rows per `keyCol`. `ttl`
    * (processing time) resets a key's budget after inactivity; pass
    * `None` for a lifetime cap. Output columns: (keyCol, idCol). */
  def admit(docs: DataFrame, keyCol: String, idCol: String, maxPerKey: Long,
            ttl: Option[java.time.Duration] = None): Dataset[(String, Long)] = {
    require(maxPerKey > 0, "admit: maxPerKey must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val ttlConf = ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
    // TimeMode.ProcessingTime makes the engine schedule a batch every
    // trigger FOREVER (to advance timers/TTL) — `processAllAvailable`
    // never settles and an idle stream busy-loops. Only opt into it when
    // a TTL actually needs the clock.
    val timeMode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    docs.select(col(keyCol).cast("string"), col(idCol).cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new QuotaProcessor(maxPerKey, ttlConf),
        timeMode, OutputMode.Append())
  }
}
