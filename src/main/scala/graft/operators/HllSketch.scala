package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog register sketch (Flajolet et al. 2007) — the mergeable
  * approximate-distinct structure a 100 TB corpus needs where exact
  * `countDistinct` would shuffle every value: per-shard vocabulary
  * size, per-source unique users, cross-snapshot overlap deltas. The
  * whole corpus reduces map-side to ≤ m=256 register rows per group;
  * only those partial maxima ever shuffle.
  *
  * ENGINE-PARITY-EXACT by construction: bucket and rank are derived
  * from the md5 hex STRING with pure string/integer ops —
  *   bucket = value of the first 2 hex chars      (8 bits, m = 256)
  *   rank   = leading zero bits of the next 60 bits + 1   (1..61)
  * where the leading-zero count is 4·(leading '0' hex chars) plus a
  * nibble lookup on the first non-zero char — no log2/float anywhere,
  * so a DuckDB replay is bit-identical (the md5-parity channel t35
  * established). Registers are a SET MAXIMUM: order- and
  * partition-independent, and sketch(A ∪ B) == merge(sketch(A),
  * sketch(B)) EXACTLY — the property that makes shard-then-merge at
  * cluster scale free (spec-pinned).
  *
  * Absent buckets (no value hashed there) are simply not emitted;
  * merge and the estimator treat them as rank 0. The float estimator
  * ([[estimate]]) is standard HLL with linear-counting small-range
  * correction — deliberately OUTSIDE the oracle-gated surface
  * (registers are exact, the estimate is an interpretation of them). */
object HllSketch {

  /** Column names the sketch/estimator generate; a key column with one
    * of these names would be silently clobbered and produce wrong groups
    * with no error (same guard as CmsSketch/QuantileSketch). */
  private[operators] val reserved = Set("bucket", "r", "s", "nb", "raw", "estimate")

  private def checkKeys(keyCols: Seq[String]): Unit = {
    val clash = keyCols.filter(reserved.contains)
    require(clash.isEmpty,
      s"key columns ${clash.mkString(", ")} collide with HllSketch " +
        s"internal/output names (${reserved.toSeq.sorted.mkString(", ")}); rename them first")
  }

  /** The register BUCKET of a value (value of the first 2 md5 hex
    * chars, 0..255) — exposed so compositions that cannot group by
    * plain column names (streaming time windows) build the same
    * layout. */
  def bucketCol(value: Column): Column =
    conv(substring(md5(value.cast("string")), 1, 2), 16, 10).cast("int")

  /** The register RANK of a value (leading zero bits of the next 60
    * md5 bits + 1, 1..61) — same bit contract as [[registers]]. */
  def rankCol(value: Column): Column = {
    val hex15 = substring(md5(value.cast("string")), 3, 15)
    val stripped = ltrim(hex15, "0")
    val first = substring(stripped, 1, 1)
    val extra = when(first === "1", 3)
      .when(first.isin("2", "3"), 2)
      .when(first.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    when(length(stripped) === 0, 61)
      .otherwise((lit(15) - length(stripped)) * 4 + extra + 1)
      .cast("int")
  }

  /** Register table: keyCols ++ (bucket INT, r INT), one row per
    * non-empty bucket per group, r = max rank. NULL values are
    * skipped (a sketch counts values, not their absence). */
  def registers(df: DataFrame, keyCols: Seq[String],
                value: Column): DataFrame = {
    checkKeys(keyCols)
    val keys = keyCols.map(col)
    df.where(value.isNotNull)
      .select(keys :+ bucketCol(value).as("bucket")
        :+ rankCol(value).as("r"): _*)
      .groupBy(keys :+ col("bucket"): _*)
      .agg(max(col("r")).as("r"))
  }

  /** Union-max of two register tables with identical key columns —
    * register-wise EQUAL to sketching the concatenated inputs. */
  def merge(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame = {
    checkKeys(keyCols)
    val keys = keyCols.map(col)
    a.unionByName(b).groupBy(keys :+ col("bucket"): _*)
      .agg(max(col("r")).as("r"))
  }

  /** Collapse grouping keys: the rolled-up sketch over the union of the
    * dropped groups — register-wise MAX, equal to sketching the
    * concatenated raw inputs (the distributed pattern: sketch per
    * shard/day/source, roll up without touching raw data again; t70
    * oracles the path against a direct global computation). `keepKeys`
    * retains a key prefix. */
  def rollup(registers: DataFrame, keepKeys: Seq[String] = Nil): DataFrame = {
    checkKeys(keepKeys)
    registers.groupBy(keepKeys.map(col) :+ col("bucket"): _*)
      .agg(max(col("r")).as("r"))
  }

  /** keyCols ++ (estimate DOUBLE): the HLL cardinality estimate with
    * linear-counting correction below 2.5·m (m = 256 fixed by the
    * 2-hex-char bucket). One aggregate over ≤ m rows per group. */
  def estimate(registers: DataFrame, keyCols: Seq[String]): DataFrame = {
    checkKeys(keyCols)
    val m = 256
    val alpha = 0.7213 / (1 + 1.079 / m)
    val keys = keyCols.map(col)
    registers.groupBy(keys: _*)
      .agg(sum(pow(lit(2.0), -col("r"))).as("s"),
        count(lit(1)).as("nb"))
      .select(keys :+
        (lit(alpha * m * m) / (col("s") + (lit(m) - col("nb"))))
          .as("raw") :+ col("nb"): _*)
      .select(keys :+
        when(col("raw") <= 2.5 * m && col("nb") < m,
          lit(m.toDouble) * log(lit(m.toDouble) / (lit(m) - col("nb"))))
          .otherwise(col("raw")).as("estimate"): _*)
  }
}
