package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Token-budget corpus selection: fill a fixed training-token budget
  * with the highest-quality documents — the final assembly step of a
  * curation pipeline ("give me the best N-token corpus"), used by
  * data-constrained scaling recipes.
  *
  * Reference scope: the reference has no corpus-assembly stage; this is
  * part of the training-data extension surface the build brief demands.
  *
  * Scale shape — the naive formulation is a single global window
  * (`sum(tokens) OVER (ORDER BY quality DESC)`), which Spark plans as
  * ONE partition holding the whole corpus: a scale-killer. This
  * implementation is the classic two-phase distributed prefix sum:
  *   1. `repartitionByRange` on the selection order (quality DESC, id)
  *      — partition p holds a contiguous slice of the global order;
  *   2. per-partition running sums via a window PARTITIONED by the
  *      range-partition id (each task scans only its slice);
  *   3. per-partition token totals → driver (bounded: one row per
  *      shuffle partition — the cardinality contract of the single
  *      `collect()` here), prefix-scanned into per-partition offsets,
  *      broadcast back as a join on pid.
  * The per-doc cumulative value depends only on the TOTAL order
  * (quality DESC, id — unique tiebreak), not on where the range
  * boundaries fall, so the result is partitioning-independent and
  * deterministic.
  */
object Selection {

  /** Greedy quality-ordered selection: keep documents, best quality
    * first (ties broken by ascending id), while the running token total
    * stays within `budget` (inclusive — a document is kept iff the
    * cumulative count INCLUDING it is ≤ budget).
    *
    * Output: (idCol, quality, n_tokens, cum_tokens) for kept docs only.
    */
  def tokenBudget(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      budget: Long = 20000L): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val id = col(idCol)

    val scored = docs.select(
      id,
      TextFunctions.qualityScore(col(textCol)).as("quality"),
      TextFunctions.tokenCount(col(textCol)).as("n_tokens"))

    val n = docs.sparkSession.sessionState.conf.numShufflePartitions
    val parted = scored
      .repartitionByRange(n, col("quality").desc, id.asc)
      .withColumn("pid", spark_partition_id())

    // One row per range partition (≤ numShufflePartitions — bounded by
    // construction, never by data volume).
    val totals: Array[Row] = parted
      .groupBy(col("pid")).agg(sum(col("n_tokens")).as("ptot"))
      .orderBy(col("pid"))
      .collect()
    val offsets = totals
      .scanLeft((0, 0L)) { case ((_, acc), r) =>
        (r.getInt(0), acc + r.getLong(1))
      }
      .sliding(2)
      .collect { case Array((_, prior), (pid, _)) => (pid, prior) }
      .toSeq
    val offsetsDf = docs.sparkSession
      .createDataFrame(offsets).toDF("pid", "offset")

    val local = Window.partitionBy(col("pid")).orderBy(col("quality").desc, id.asc)
    parted
      .join(broadcast(offsetsDf), "pid")
      .withColumn("cum_tokens", sum(col("n_tokens")).over(local) + col("offset"))
      .filter(col("cum_tokens") <= budget)
      .select(id, col("quality"), col("n_tokens"), col("cum_tokens"))
  }
}
