package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
