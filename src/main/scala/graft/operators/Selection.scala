package graft.operators

import org.apache.spark.sql.DataFrame
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
  * ONE partition holding the whole corpus: a scale-killer. This is the
  * two-phase distributed prefix sum instead, bucketed by the QUALITY
  * VALUE itself rather than by sampled range boundaries:
  *   1. quality is rounded to 4 dp in [0, 1], so there are ≤ 10 001
  *      distinct levels — the per-level token totals are a BOUNDED
  *      table by construction;
  *   2. per-level offsets (tokens in all strictly-better levels) come
  *      from a running-sum window over that level table — global-order
  *      but level-table-sized, the same bounded-global-window trade the
  *      mixture operator documents — and broadcast-join back;
  *   3. each level's running sum is a window PARTITIONED by the level,
  *      ordered by id — within-level order and cross-level offsets
  *      compose into the exact global cumulative count.
  * Everything is ONE action with no driver collect; because the bucket
  * is the value, the aggregation and the join agree on every row's
  * bucket by construction — a sampled `repartitionByRange` would draw
  * DIFFERENT boundaries for a totals pass and a final pass (the range
  * sampler's seed includes the RDD id), mis-assigning offsets near
  * boundaries at corpus scale. Skew note: all docs sharing one level
  * serialize through one window task; if a corpus concentrates in a
  * single level, sub-split the level by an id range before the window
  * (not needed for any test corpus).
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

    // ≤ 10 001 rows (4-dp quality levels) — bounded by construction;
    // the partition-less offset window runs over THIS table, not the
    // corpus (the Mixture convention for strata-sized normalizers)
    val levels = scored
      .groupBy(col("quality")).agg(sum(col("n_tokens")).as("qtot"))
    // in-plan fail-fast on the boundedness invariant (still ONE action):
    // if a caller ever feeds unrounded quality, this aborts with a named
    // error instead of a late single-task window / broadcast OOM
    val guard = levels.agg(count(lit(1)).as("n_levels"))
      .select(assert_true(col("n_levels") <= 20002,
        lit("Selection.tokenBudget: quality level table exceeded its rounded-4dp bound")
      ).as("__guard"))
    val offsetW = Window.orderBy(col("quality").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = levels.select(col("quality"),
      coalesce(sum(col("qtot")).over(offsetW), lit(0L)).as("offset"))
      // the filter REFERENCES the assert column so pruning can't elide
      // it (assert_true is null on success, throws on violation)
      .crossJoin(guard).filter(col("__guard").isNull).drop("__guard")

    // join key = the level value both subtrees computed identically
    // (same rounded arithmetic, same provenance — never a sampled
    // boundary); broadcast keeps the corpus side shuffle-free
    val inLevel = Window.partitionBy(col("quality")).orderBy(id.asc)
    scored
      .join(broadcast(offsets), "quality")
      .withColumn("cum_tokens", sum(col("n_tokens")).over(inLevel) + col("offset"))
      .filter(col("cum_tokens") <= budget)
      .select(id, col("quality"), col("n_tokens"), col("cum_tokens"))
  }
}
