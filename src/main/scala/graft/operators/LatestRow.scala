package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A2/O1/O2 — deterministic latest-row selection (SURVEY.md §2.5, §2.8).
  *
  * The reference stable-sorts by a DatetimeIndex and takes the physical
  * last row (sens_file_analysis.py:66-90); pandas' mergesort stability
  * makes ties deterministic. Spark's sort is NOT stable, so ties are
  * broken by an explicit unique tiebreaker column — callers must supply
  * one (any unique id). This is a window row_number, which at scale is a
  * single shuffle on the partition keys with no driver materialization.
  */
object LatestRow {

  /** Latest row per group: order by `orderCols` descending (latest first),
    * ties broken by `tiebreaker` descending. */
  def perGroup(df: DataFrame, groupCols: Seq[String], orderCol: String,
               tiebreaker: String): DataFrame = {
    val w = Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(orderCol).desc, col(tiebreaker).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Global latest row (the reference's whole-file case = one group).
    * Expressed as max_by over a struct so it stays a single aggregate
    * (no global sort). */
  def global(df: DataFrame, orderCol: String, tiebreaker: String): DataFrame = {
    val payload = struct(df.columns.toIndexedSeq.map(col): _*)
    val key = struct(col(orderCol), col(tiebreaker))
    df.agg(max_by(payload, key).as("__row")).select(col("__row.*"))
  }

  /** O3 — oldest candidate (min_by), Pipeline.py:145-160. */
  def oldest(df: DataFrame, orderCol: String, tiebreaker: String): DataFrame = {
    val payload = struct(df.columns.toIndexedSeq.map(col): _*)
    val key: Column = struct(col(orderCol), col(tiebreaker))
    df.agg(min_by(payload, key).as("__row")).select(col("__row.*"))
  }
}
