package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Log-linear quantile sketch — the mergeable approximate-QUANTILE
  * structure that completes the sketch family (t64 HLL = distincts,
  * t65 CMS = frequencies): per-source document-length percentiles,
  * latency/size distribution reports, at 100 TB where an exact
  * `percentile` would shuffle every value. The corpus reduces map-side
  * to ≤ 16·63 + 1 bucket rows per group; only those partial counts
  * ever shuffle, and sketch(A ∪ B) == merge(sketch(A), sketch(B))
  * EXACTLY (counts are integer sums — spec-pinned).
  *
  * The same bucket layout as DDSketch (Masson et al., VLDB 2019) /
  * HDR-histogram, but with the index derived by PURE INTEGER bit
  * arithmetic instead of a float logarithm, so a DuckDB replay is
  * bit-identical (the t57/t62 integer-exactness channel):
  *
  *   e      = length(bin(v)) - 1            (= floor(log2 v), exact)
  *   sub    = (v >> (e-4)) - 16   if e >= 4 (top-4 mantissa bits)
  *          = (v - 2^e) << (4-e)  if e <  4 (scale up; buckets exact)
  *   bucket = 16·e + sub          (v = 0 -> bucket -1)
  *
  * Bucket b >= 0 covers [(16+sub)·2^(e-4), (17+sub)·2^(e-4)) — relative
  * width 1/16, so any quantile readout (the bucket's LOWER bound, also
  * pure shifts) is within 6.25 % below the true order statistic, and
  * EXACT for v < 16 (sub-integer bucket widths). Values are
  * non-negative by contract (counts, sizes, durations); negatives are
  * filtered and the caller owns that domain guarantee (spec-pinned). */
object QuantileSketch {

  /** Sub-buckets per octave: 16 = top-4 mantissa bits. */
  val K = 16

  /** Column names the sketch/readout generate; a key column with one of
    * these names would be silently clobbered by withColumn/select and
    * produce wrong groups with no error, so reject it up front. */
  private[operators] val reserved =
    Set("bucket", "c", "cum", "n", "q_pct", "est", "__qs_v", "__qs_e")

  private def checkKeys(keyCols: Seq[String]): Unit = {
    val clash = keyCols.filter(reserved.contains)
    require(clash.isEmpty,
      s"key columns ${clash.mkString(", ")} collide with QuantileSketch " +
        s"internal/output names (${reserved.toSeq.sorted.mkString(", ")}); rename them first")
  }

  /** The sketch as a table: keyCols ++ (bucket INT, c BIGINT), one row
    * per non-empty bucket per group (absent buckets are zero, the
    * HLL/CMS convention). NULL and negative values are skipped. One
    * scan; partial aggregation collapses to the fixed bucket space
    * before any exchange — map-side combine is the point of the
    * bounded layout. */
  /** The log-linear bucket id of a non-negative integral value — the
    * same pure-integer bit arithmetic as [[sketch]], exposed as a
    * self-contained Column so compositions that cannot group by plain
    * column names (streaming time windows) build the same layout (the
    * HllSketch.bucketCol / CmsSketch.cellsCol convention). */
  def bucketCol(value: Column): Column = {
    val v = value.cast("long")
    val e = (length(bin(v)) - 1).cast("int")
    val sub = when(e >= 4,
        call_function("shiftright", v, e - lit(4)) - 16)
      .otherwise(call_function("shiftleft",
        v - call_function("shiftleft", lit(1L), e), lit(4) - e))
    when(v === 0, lit(-1)).otherwise(e * K + sub).cast("int")
  }

  def sketch(df: DataFrame, keyCols: Seq[String], value: Column): DataFrame = {
    checkKeys(keyCols)
    val keys = keyCols.map(col)
    df.where(value.isNotNull && value >= 0)
      .select(keys :+ bucketCol(value).as("bucket"): _*)
      .groupBy(keys :+ col("bucket"): _*)
      .agg(count(lit(1)).as("c"))
  }

  /** Bucket-wise sum of two sketches with identical key columns —
    * EQUAL to sketching the concatenated inputs. */
  def merge(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame = {
    checkKeys(keyCols)
    val keys = keyCols.map(col)
    a.unionByName(b).groupBy(keys :+ col("bucket"): _*)
      .agg(sum(col("c")).as("c"))
  }

  /** Collapse grouping keys: the rolled-up sketch over the union of the
    * dropped groups — bucket-wise integer SUM, equal to sketching the
    * concatenated raw inputs (the distributed pattern: sketch per
    * shard/partition/day, roll up without ever touching raw data
    * again; t69 oracles the whole path against a direct global
    * computation). `keepKeys` retains a key prefix (e.g. roll daily
    * sketches up to monthly). */
  def rollup(sk: DataFrame, keepKeys: Seq[String] = Nil): DataFrame = {
    checkKeys(keepKeys)
    sk.groupBy(keepKeys.map(col) :+ col("bucket"): _*)
      .agg(sum(col("c")).as("c"))
  }

  /** Lower bound of the column literally named `bucket` — pure shifts,
    * the readout estimate: (16+sub)·2^(e-4), computed as a left shift
    * for e >= 4 and a right shift below (exact: sub is then a multiple
    * of 2^(4-e) by construction). */
  private def lowerBound: Column =
    when(col("bucket") === -1, lit(0L))
      .otherwise(when(col("bucket") >= 4 * K,
        expr(s"shiftleft(cast($K + bucket % $K as bigint), bucket div $K - 4)"))
        .otherwise(expr(
          s"shiftright(cast($K + bucket % $K as bigint), 4 - bucket div $K)")))

  /** Quantile readout: keyCols ++ (q_pct INT, est BIGINT, n BIGINT) for
    * each requested integer percentile. The target rank is the exact
    * integer ceil(pct·n/100) = (pct·n + 99) div 100; the answer bucket
    * is the smallest with cumulative count >= rank (cumulative count is
    * strictly monotone over present buckets), and the estimate is its
    * lower bound — every step integer-exact, so unlike the HLL float
    * estimator this readout IS oracle-gated. Runs on the bounded bucket
    * table only: the window partitions carry <= ~1000 rows per group. */
  def quantiles(sk: DataFrame, keyCols: Seq[String], pcts: Seq[Int]): DataFrame = {
    checkKeys(keyCols)
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100]: $pcts")
    val keys = keyCols.map(col)
    val wCum = Window.partitionBy(keys: _*).orderBy(col("bucket"))
    val wAll = Window.partitionBy(keys: _*)
    sk.withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .withColumn("q_pct", explode(array(pcts.map(lit(_)): _*)))
      .where(col("cum") >= expr("(q_pct * n + 99) div 100"))
      .groupBy(keys :+ col("q_pct") :+ col("n"): _*)
      .agg(min(col("bucket")).as("bucket"))
      .select(keys :+ col("q_pct") :+ lowerBound.as("est") :+ col("n"): _*)
  }
}
