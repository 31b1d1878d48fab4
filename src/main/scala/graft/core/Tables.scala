package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-generated TPC-H-ish corpus (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. All reads go through here so
  * every query benefits from the same scan configuration; Catalyst pushes
  * filters/column pruning into these scans automatically.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Gated scan widening — the input-skew remedy (optimization guide
    * §2.5: "one huge unsplittable file … repartition immediately after
    * the read") for scan-stage-heavy operators: round-robin repartition
    * to `defaultParallelism`, applied ONLY when the frame arrives with
    * fewer partitions. A single small parquet file (or one with a
    * single row group, which Spark cannot split regardless of
    * maxPartitionBytes) otherwise serializes the whole scan-stage
    * expression work — tokenization, signature hashing, per-row
    * scoring — onto one or two tasks (bench-measured: 1.1-1.9
    * effective cores on heavy-expression queries at sf0.1). At real
    * corpus scale the scan has ≥ cores splits and this is the
    * identity: no exchange is added at 100 TB. Row-level results are
    * unchanged; rounded float AGGREGATES over regrouped partials are
    * re-verified against the oracle wherever this is applied.
    *
    * The gate reads `queryExecution.toRdd` (not `.rdd`, which builds —
    * and then discards — a full row-deserializer conversion per call;
    * r19 advice). Caveat: this is the pre-AQE physical partition count;
    * under adaptive execution the executed width can differ (AQE only
    * coalesces, so a pre-AQE count ≥ np still means "wide enough"). */
  def widened(df: DataFrame): DataFrame = {
    val np = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions < np) df.repartition(np)
    else df
  }

  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  /** events.ts normalization: whatever the corpus writer encoded, downstream
    * operators always see a UTC `TimestampType` column.
    *
    *  - parquet TIMESTAMP(NANOS): with `spark.sql.legacy.parquet.nanosAsLong`
    *    it surfaces as a Long that we truncate to microseconds (what DuckDB's
    *    reader does too);
    *  - parquet micros with `isAdjustedToUTC=false` (the common
    *    pandas/pyarrow no-tz output): Spark 4 reads TIMESTAMP_NTZ; we adopt
    *    the reference's naive-datetime-is-UTC convention
    *    (conv/scripts/udbf_file_analysis.py:135-143) — under the engine's UTC
    *    session zone the cast is value-identical;
    *  - already-UTC TimestampType passes through. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = apply(s, d, "events")
    normalizeTs(raw, "ts")
  }

  /** Normalize a timestamp-ish column to UTC TimestampType regardless of
    * parquet encoding (nanos-as-Long, TIMESTAMP_NTZ, or TIMESTAMP_LTZ). */
  def normalizeTs(df: DataFrame, colName: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName, expr(s"timestamp_micros($colName div 1000)"))
      case _: TimestampNTZType =>
        df.withColumn(colName, org.apache.spark.sql.functions.col(colName).cast(TimestampType))
      case _ => df
    }
  }
  /** Conform drift-prone columns to their canonical types (the NTZ
    * lesson generalized): a regenerated corpus that writes int32 ids or
    * float64 embeddings must not break or silently re-type downstream
    * operators. Only listed columns are touched; a cast is added only
    * when the read type MATERIALLY differs, so the common case is a
    * no-op plan. "Materially" ignores array containsNull: a writer
    * that marks embedding elements non-nullable still reads as
    * array<float>, and casting it on every scan would defeat the
    * no-op-plan intent (values are unchanged by nullability). */
  private def sameShape(a: org.apache.spark.sql.types.DataType,
                        b: org.apache.spark.sql.types.DataType): Boolean =
    (a, b) match {
      case (x: org.apache.spark.sql.types.ArrayType,
            y: org.apache.spark.sql.types.ArrayType) =>
        sameShape(x.elementType, y.elementType)
      case _ => a == b
    }

  private def conform(df: DataFrame, want: Map[String, org.apache.spark.sql.types.DataType]): DataFrame =
    want.foldLeft(df) { case (acc, (c, t)) =>
      if (acc.columns.contains(c) && !sameShape(acc.schema(c).dataType, t))
        acc.withColumn(c, org.apache.spark.sql.functions.col(c).cast(t))
      else acc
    }

  def documents(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    conform(apply(s, d, "documents"),
      Map("doc_id" -> LongType, "n_chars" -> LongType))
  }
  def embeddings(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    conform(apply(s, d, "embeddings"),
      Map("vec_id" -> LongType, "label" -> IntegerType,
        "embedding" -> ArrayType(FloatType)))
  }
}
