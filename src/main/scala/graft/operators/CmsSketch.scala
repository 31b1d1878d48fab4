package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–min sketch (Cormode & Muthukrishnan 2005) — the mergeable
  * approximate-FREQUENCY structure that pairs with the HLL register
  * sketch (t64, approximate distincts): per-token corpus frequencies,
  * per-host request counts, per-shingle document frequencies, at 100 TB
  * where an exact `groupBy(token).count` would shuffle the whole token
  * stream. The sketch reduces map-side to ≤ Depth·Width = 16 384
  * counter rows; only those partial sums ever shuffle, and
  * sketch(A ∪ B) == merge(sketch(A), sketch(B)) EXACTLY (counters are
  * integer sums — order- and partition-independent, spec-pinned).
  *
  * ENGINE-PARITY-EXACT by construction (the t64/t35 md5 channel): hash
  * row j maps a value to counter `idx = first 3 hex chars of
  * md5(j || ':' || value)` — 12 bits, Width = 4096 with no modulo bias,
  * pure string/integer ops, so a DuckDB replay is bit-identical.
  *
  * Estimates are `min` over the Depth row counters: never an
  * UNDERestimate (every occurrence of v increments all Depth cells v
  * hashes to), overestimate bounded by collisions — E[err] ≤ N/Width
  * per row, min over 4 independent rows. Both properties are
  * spec-pinned; the no-false-negative side is what makes the
  * heavy-hitter pass sound. */
object CmsSketch {

  val Depth = 4
  val Width = 4096 // 3 hex chars = 12 bits; no modulo, no bias

  /** Column names the sketch/estimate generate; a key column with one of
    * these names would be silently clobbered and produce wrong groups
    * with no error, so reject it up front (same guard as QuantileSketch). */
  private[operators] val reserved = Set("j", "idx", "c", "cell", "est", "__v")

  private def checkKeys(keyCols: Seq[String]): Unit = {
    val clash = keyCols.filter(reserved.contains)
    require(clash.isEmpty,
      s"key columns ${clash.mkString(", ")} collide with CmsSketch " +
        s"internal/output names (${reserved.toSeq.sorted.mkString(", ")}); rename them first")
  }

  /** Counter index for hash row j: value of the first 3 hex chars of
    * md5("j:" ++ value). */
  private def idx(j: Int, value: Column): Column =
    conv(substring(md5(concat(lit(s"$j:"), value)), 1, 3), 16, 10)
      .cast("int")

  /** The Depth (j, idx) cells of a value as an array column — exposed
    * so compositions that cannot group by plain column names
    * (streaming time windows) build the same bit-exact counter layout
    * (the HllSketch.bucketCol/rankCol convention). */
  def cellsCol(value: Column): Column =
    array((0 until Depth).map(j =>
      struct(lit(j).as("j"), idx(j, value).as("idx"))): _*)

  /** The sketch as a table: keyCols ++ (j INT, idx INT, c BIGINT), one
    * row per non-empty counter per group (absent cells are zero, as in
    * the HLL register convention). NULL values are skipped — a
    * frequency sketch counts values, not their absence.
    *
    * One corpus scan; the explode emits Depth cells per value but the
    * partial aggregation collapses them to ≤ Depth·Width rows per
    * partition before any exchange — map-side combine is the whole
    * point of the fixed-size layout. */
  def sketch(df: DataFrame, keyCols: Seq[String], value: Column): DataFrame = {
    checkKeys(keyCols)
    val keys = keyCols.map(col)
    df.where(value.isNotNull)
      .select(keys :+ explode(cellsCol(value)).as("cell"): _*)
      .select(keys :+ col("cell.j").as("j") :+ col("cell.idx").as("idx"): _*)
      .groupBy(keys :+ col("j") :+ col("idx"): _*)
      .agg(count(lit(1)).as("c"))
  }

  /** Counter-wise sum of two sketches with identical key columns —
    * EQUAL to sketching the concatenated inputs (integer sums commute;
    * the merge property that makes shard-then-merge free). */
  def merge(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame = {
    checkKeys(keyCols)
    val keys = keyCols.map(col)
    a.unionByName(b)
      .groupBy(keys :+ col("j") :+ col("idx"): _*)
      .agg(sum(col("c")).as("c"))
  }

  /** Point estimates for a candidate column: `cand` ++ (est BIGINT),
    * est = min over the Depth rows of the matching counters. The
    * sketch is counter-bounded (≤ 16 384 rows per group) so the join
    * broadcasts; candidates stream through it scan-side. A counter row
    * ABSENT from the sketch is a zero cell (never incremented), so the
    * per-cell count coalesces to 0 BEFORE the min — a candidate with
    * any empty cell correctly estimates 0 (min over nulls would
    * instead report pure collision mass; pinned-vector spec). */
  def estimate(sk: DataFrame, candidates: DataFrame, cand: Column): DataFrame = {
    val cells = array((0 until Depth).map(j =>
      struct(lit(j).as("j"), idx(j, cand).as("idx"))): _*)
    candidates
      .select(cand.as("__v"), explode(cells).as("cell"))
      .select(col("__v"), col("cell.j").as("j"), col("cell.idx").as("idx"))
      .join(broadcast(sk), Seq("j", "idx"), "left")
      .groupBy(col("__v"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** Heavy hitters: the distinct values whose sketch estimate is at
    * least `minShare` of the total stream count — (v STRING,
    * est BIGINT), estimate-descending. CMS guarantees NO FALSE
    * NEGATIVES (est ≥ true count), so every truly-heavy value appears;
    * collision overestimates can only ADD near-threshold values, the
    * standard sketch trade (verify survivors exactly downstream if
    * exactness matters — they are few by construction).
    *
    * Two corpus scans (sketch build + distinct candidates) and one
    * broadcast of the ≤ 16 384-row sketch; the total count N rides out
    * of the sketch itself (Σ counters of row j=0 is EXACTLY N — each
    * value lands in exactly one row-0 cell), so the threshold costs no
    * extra pass. */
  def heavyHitters(df: DataFrame, value: Column, minShare: Double): DataFrame = {
    val sk = sketch(df, Nil, value).localCheckpoint(eager = false)
    val total = sk.where(col("j") === 0).agg(sum(col("c")).as("n"))
    val vocab = df.where(value.isNotNull).select(value.as("v")).distinct()
    estimate(sk, vocab, col("v"))
      .join(broadcast(total))
      .where(col("est") >= ceil(col("n") * minShare))
      .select(col("__v").as("v"), col("est"))
      .orderBy(col("est").desc, col("v"))
  }

  /** Per-GROUP heavy hitters: values whose estimate is at least
    * `minShare` of their OWN group's stream — keyCols ++ (v, est),
    * (group, estimate-desc) ordered. Same no-false-negative guarantee
    * per group. The sketch is ≤ Depth·Width rows PER GROUP and each
    * group's total rides out of its own j=0 row, so the extra cost
    * over the global pass is only the key columns on the shuffles; the
    * candidate join keys on (group, j, idx) and AQE broadcasts the
    * sketch side whenever the group count keeps it small. */
  def heavyHittersBy(df: DataFrame, keyCols: Seq[String], value: Column,
                     minShare: Double): DataFrame = {
    require(keyCols.nonEmpty, "use heavyHitters for the global pass")
    checkKeys(keyCols)
    val keys = keyCols.map(col)
    val sk = sketch(df, keyCols, value).localCheckpoint(eager = false)
    val total = sk.where(col("j") === 0)
      .groupBy(keys: _*).agg(sum(col("c")).as("n"))
    val cells = array((0 until Depth).map(j =>
      struct(lit(j).as("j"), idx(j, col("__v")).as("idx"))): _*)
    df.where(value.isNotNull)
      .select(keys :+ value.as("__v"): _*).distinct()
      .select(keys :+ col("__v") :+ explode(cells).as("cell"): _*)
      .select(keys :+ col("__v") :+ col("cell.j").as("j")
        :+ col("cell.idx").as("idx"): _*)
      .join(sk, keyCols ++ Seq("j", "idx"), "left")
      .groupBy(keys :+ col("__v"): _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
      .join(total, keyCols)
      .where(col("est") >= ceil(col("n") * minShare))
      .select(keys :+ col("__v").as("v") :+ col("est"): _*)
      .orderBy(keys :+ col("est").desc :+ col("v"): _*)
  }
}
