package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sequence packing for pretraining: lay a corpus out as the
  * concatenate-then-chunk token stream every LLM data loader consumes —
  * documents are concatenated in a deterministic order and the stream is
  * cut into fixed `ctxLen` context windows. The operator answers, for
  * every document, WHERE it lands: which window its first token falls in
  * (`seq_first`), which its last token falls in (`seq_last` — a document
  * may straddle windows), and its starting offset inside the first
  * window. Downstream uses: packing-efficiency accounting
  * (tokens/window), boundary-crossing statistics, and a deterministic
  * doc→window index for sharded loaders.
  *
  * The packing order is (stratum, shard, doc_id): one independent token
  * stream per (strataCol, doc_id % shards). Sharding is what makes the
  * running sum scale — a single global stream would serialize into one
  * window-function task, while strata × `shards` streams spread across
  * the cluster (raise `shards` with corpus size; each stream's cumsum is
  * one window partition). Zero-token documents are excluded — they
  * occupy no stream positions.
  *
  * Pure integer window arithmetic over token counts — fully
  * SQL-oracle-able (one cumulative-sum window per stream in any engine).
  */
object Packing {

  def contextPack(df: DataFrame, idCol: String, textCol: String,
                  strataCol: String, ctxLen: Int, shards: Int = 8)
      : DataFrame = {
    require(ctxLen >= 1 && shards >= 1)
    val w = Window.partitionBy(col(strataCol), col("shard"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(strataCol),
        pmod(col(idCol), lit(shards.toLong)).cast("int").as("shard"),
        TextFunctions.tokenCount(col(textCol)).as("n_tokens"))
      .filter(col("n_tokens") >= 1)
      .withColumn("stream_end", sum(col("n_tokens")).over(w))
      .select(col(idCol), col(strataCol), col("shard"), col("n_tokens"),
        floor((col("stream_end") - col("n_tokens")) / ctxLen).as("seq_first"),
        floor((col("stream_end") - 1) / ctxLen).as("seq_last"),
        ((col("stream_end") - col("n_tokens")) % ctxLen).as("offset_in_seq"))
  }
}
