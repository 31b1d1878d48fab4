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

  /** NEAR-duplicate admission on a document stream: a document is
    * admitted iff no near-duplicate predecessor arrived within the
    * watermark horizon. Composition of the batch MinHash machinery
    * ([[graft.operators.Dedup.minHashPairs]]'s banding — same native
    * signature expression, same band/bucket construction) with two
    * chained stateful stages:
    *
    *   1. band the signature and `dropDuplicatesWithinWatermark` on
    *      (band, bucket): the FIRST document to present each bucket owns
    *      it; state is one row per bucket per watermark horizon;
    *   2. windowed count per document: a document that owns ALL its
    *      bands had no band collide with an earlier document → admit.
    *      Any band owned by a predecessor means an estimated-Jaccard
    *      near-dup upstream → drop.
    *
    * LSH semantics carry over from batch: admission is approximate
    * (collision probability per band = est-Jaccard^rows), ties within
    * one micro-batch resolve arbitrarily but exactly one representative
    * of a duplicate set is admitted. Output appends at window close
    * (event time must pass window end + `delay`), carrying (idCol,
    * window_start). Scale shape: one shuffle on (band, bucket) + one on
    * (window, id); state is bounded by distinct buckets and open
    * windows per horizon — never stream history. */
  def nearDupWithinWatermark(docs: DataFrame, tsCol: String, idCol: String,
      textCol: String, delay: String = "10 minutes",
      windowLen: String = "1 minute",
      numHashes: Int = 32, bands: Int = 8,
      shingleSize: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // projection FIRST, watermark AFTER it (a later projection would
    // re-create the attributes and drop the watermark tag)
    val banded = docs
      .select(col(idCol), col(tsCol),
        call_function("graft_minhash_sig",
          graft.functions.TextFunctions.shingles(col(textCol), shingleSize),
          lit(numHashes)).as("sig"))
      .select(col(idCol), col(tsCol),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"),
            xxhash64(slice(col("sig"), b * rows + 1, lit(rows))).as("bucket"))))
          .as("bb"))
      .select(col(idCol), col(tsCol),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .withWatermark(tsCol, delay)

    banded
      .dropDuplicatesWithinWatermark(Seq("band", "bucket"))
      .groupBy(window(col(tsCol), windowLen), col(idCol))
      .agg(count(lit(1)).as("owned_bands"))
      .filter(col("owned_bands") === bands)
      .select(col(idCol), col("window.start").as("window_start"))
  }

  /** Near-dup flags against a PERSISTED signature index — the t87
    * incremental-dedup shape on a stream: history was curated once and
    * kept as signatures; each arriving document is banded and checked
    * against it. STATELESS by design: a stream-static equi-join on
    * (band, bucket) plus the estimate filter — no watermark, no state
    * store, so it composes under any output mode. One row is emitted
    * PER BAND COLLISION (a pair colliding in k bands appears k times);
    * collapsing to one decision per document is the downstream sink's
    * job (per-batch distinct in foreachBatch, or the K6 idempotent
    * store) — the stateless-join contract of Structured Streaming.
    *
    * Scale shape: the banded index is a static frame the caller should
    * `.cache()` (it is re-read every micro-batch otherwise); small
    * indexes broadcast, large ones hash-join on (band, bucket). The
    * stream side adds `bands` thin rows per document, signatures
    * computed scan-stage by the native expression. */
  def againstIndex(docs: DataFrame, textCol: String, idCol: String,
      index: DataFrame, numHashes: Int = 32, bands: Int = 8,
      minEst: Double = 0.5): DataFrame = {
    val inc = graft.operators.IncrementalDedup.banded(
      graft.operators.IncrementalDedup.signatureIndex(docs, textCol, idCol, numHashes),
      "new_id", "new_sig", numHashes, bands)
    val idx = graft.operators.IncrementalDedup.banded(
      index.select(col("doc_id"), col("sig")), "old_id", "old_sig", numHashes, bands)
    inc.join(idx, Seq("band", "bucket"))
      .select(col("new_id"), col("old_id"),
        round(call_function("graft_match_frac", col("new_sig"), col("old_sig")), 4)
          .as("est_jaccard"))
      .where(col("est_jaccard") >= minEst)
  }
}
