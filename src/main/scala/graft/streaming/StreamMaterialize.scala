package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming materialized view of a changelog — the t96 CDC merge
  * semantics kept continuously up to date: per key, the HIGHEST-seq
  * operation wins; a winning delete is a tombstone row (`op = 'D'`)
  * the sink drops or applies. Built entirely on Spark's AGGREGATE
  * state (groupBy + max(struct)) rather than custom
  * mapGroupsWithState: the state store holds exactly one struct per
  * key — the same record a batch merge would keep — and update mode
  * emits only keys a micro-batch touched.
  *
  * Scale shape: one shuffle on the key; state size tracks live key
  * cardinality, never changelog history (the aggregation is a running
  * max, not a buffer). Emitted in update mode; complete mode works for
  * bounded key domains (dashboards). Spec pins stream == batch t96
  * semantics on the same rows. */
object StreamMaterialize {

  /** (keyCol, op, seq, value...) changelog → one row per key carrying
    * the winning (seq, op, value). Downstream filters `op <> 'D'` (or
    * applies tombstones to its store).
    *
    * PRECONDITION: `seqCol` must be unique per key (the standard CDC
    * log-sequence-number contract, and what t96 pins). At equal seq the
    * max(struct) tie-break falls through to (op, value) lexicographic
    * order — 'U' beats 'D' — so a duplicate delivery of the same seq
    * with a different op could resurrect a deleted key. If the source
    * cannot guarantee unique seqs, extend seqCol with a delivery-unique
    * tiebreaker (e.g. struct(seq, ingest_offset)) before calling. */
  def latest(changes: DataFrame, keyCol: String, seqCol: String,
             opCol: String, valueCol: String): DataFrame =
    changes.groupBy(col(keyCol))
      .agg(max(struct(col(seqCol).as("seq"), col(opCol).as("op"),
        col(valueCol).as("v"))).as("m"))
      .select(col(keyCol), col("m.seq").as("last_seq"),
        col("m.op").as("op"), col("m.v").as(valueCol))

  /** One materialized-view row as [[latestCompacting]] emits it. */
  final case class MatRecord(key: Long, last_seq: Long, op: String,
                             value: String)

  private[streaming] final case class MatState(seq: Long, op: String, v: String)

  /** [[latest]] with TOMBSTONE COMPACTION — the knob [[latest]] cannot
    * have: its aggregate state keeps one struct per key FOREVER,
    * including keys whose winning op is a delete, so a changelog that
    * churns keys (create → delete → never again) grows state without
    * bound even though the live key set is small. This explicit-state
    * variant (flatMapGroupsWithState — the [[Sessionize.stateful]]
    * escape-hatch pattern) forgets a tombstoned key once the event-time
    * watermark passes `tombstoneTtlMs` beyond the tombstone's last
    * touch — Kafka log compaction's `delete.retention.ms` semantics.
    *
    * The TTL trade, stated plainly: while the tombstone is live, stale
    * lower-seq redeliveries stay dead (emitted as the tombstone, same
    * as [[latest]]); after it expires, a row older than the forgotten
    * delete would RESURRECT the key. Size the TTL to the source's
    * maximum redelivery lag, exactly as with Kafka compaction.
    * Non-delete winners never expire — live-key state is the view.
    *
    * Emits the winning (key, last_seq, op, value) for every key a
    * micro-batch touches (update-mode view; pair with
    * `outputMode("update")`). Same winner semantics as [[latest]]:
    * max by (seq, op, value) with null value ordered lowest —
    * bit-compatible with the batch `max(struct)` merge (spec-pinned).
    * Typed shape (long key/seq, string op/value) — the escape-hatch
    * convention; `tsCol` is the changelog's event-time column that
    * drives the watermark and the TTL clock. */
  def latestCompacting(changes: DataFrame, keyCol: String, seqCol: String,
                       opCol: String, valueCol: String, tsCol: String,
                       tombstoneTtlMs: Long,
                       watermarkDelay: String = "0 seconds"): Dataset[MatRecord] = {
    val spark = changes.sparkSession
    import spark.implicits._
    require(tombstoneTtlMs > 0, "tombstoneTtlMs must be positive")

    // Spark struct-max order: seq, then op, then value, nulls lowest
    def wins(a: MatState, b: MatState): MatState = {
      val c = java.lang.Long.compare(a.seq, b.seq) match {
        case 0 => a.op.compareTo(b.op) match {
          case 0 => (a.v, b.v) match {
            case (null, null) => 0
            case (null, _) => -1
            case (_, null) => 1
            case (x, y) => x.compareTo(y)
          }
          case oc => oc
        }
        case sc => sc
      }
      if (c >= 0) a else b
    }

    changes
      .select(col(keyCol).cast("long").as("__key"),
        col(seqCol).cast("long").as("__seq"),
        col(opCol).cast("string").as("__op"),
        col(valueCol).cast("string").as("__value"),
        col(tsCol).cast("timestamp").as("__ts"))
      .withWatermark("__ts", watermarkDelay)
      .as[(Long, Long, String, String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[MatState, MatRecord](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[(Long, Long, String, String, Timestamp)],
         state: GroupState[MatState]) =>
          if (state.hasTimedOut) {
            // the tombstone outlived its TTL: forget the key entirely.
            // Nothing is emitted — the delete was already emitted when
            // it won; this is pure state compaction.
            state.remove()
            Iterator.empty
          } else {
            var cur = state.getOption.orNull
            var maxTsMs = Long.MinValue
            it.foreach { case (_, seq, op, value, ts) =>
              val cand = MatState(seq, op, value)
              cur = if (cur == null) cand else wins(cur, cand)
              if (ts != null) maxTsMs = math.max(maxTsMs, ts.getTime)
            }
            state.update(cur)
            if (cur.op == "D") {
              // TTL clock = last touch (event time or watermark,
              // whichever is ahead — setTimeoutTimestamp rejects
              // timestamps at or behind the watermark)
              state.setTimeoutTimestamp(
                math.max(maxTsMs, state.getCurrentWatermarkMs() + 1)
                  + tombstoneTtlMs)
            }
            Iterator.single(MatRecord(key, cur.seq, cur.op, cur.v))
          }
      }
  }
}
