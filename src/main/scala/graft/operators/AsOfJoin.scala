package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — an operator Spark's join zoo lacks
  * natively (pandas `merge_asof` / DuckDB `ASOF JOIN` territory, and the
  * join every sensor/market-data backfill needs: "attach the most recent
  * reference reading at or before this row's timestamp").
  *
  * Spark-first plan: NO join node at all. Both sides are union-tagged
  * into one stream that shuffles ONCE on the key, sorts by
  * (ts, side) within each key partition, and a running
  * `last(payload, ignoreNulls)` window propagates the most recent right
  * values onto every left row. Right rows order BEFORE left rows at
  * equal timestamps, so an exact-timestamp match is visible to its left
  * row (the `>=` convention, matching DuckDB's `ASOF JOIN ... ON l.ts >=
  * r.ts`). Cost is one exchange + one sort of |L|+|R| rows — there is no
  * candidate-pair explosion, no range-join quadratic blowup, and key
  * skew degrades into a big sort partition rather than a cross product.
  * AQE's skew handling cannot split a window partition, so at extreme
  * single-key skew the caller should range-bucket the timestamp into the
  * key (documented trade-off; the relational alternative — a range join —
  * explodes quadratically on exactly the same skew).
  *
  * Contract: right rows with NULL timestamps are dropped (they can never
  * satisfy `l.ts >= r.ts`); left rows always survive (left-join
  * semantics) with NULL payload when no earlier right row exists. All
  * payload columns are packed into ONE struct per right row before the
  * window, so the propagated values always come from the SAME right row
  * (atomic match, as in pandas/DuckDB ASOF), and a right row whose
  * payload value is genuinely NULL propagates that NULL rather than
  * falling back to an older row. If multiple right rows share (key, ts),
  * the propagated row is the last in (ts, side) sort order within the
  * union — callers needing a deterministic pick among exact duplicates
  * should pre-aggregate the right side (e.g. `max_by`) to one row per
  * (key, ts).
  *
  * Output: every left column, plus `<outPrefix><payloadCol>` for each
  * requested right payload column. */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTsCol: String, rightTsCol: String,
           payload: Seq[String], outPrefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "asOf: at least one key column")
    require(payload.nonEmpty, "asOf: at least one payload column")
    val rightTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    payload.foreach(c => require(rightTypes.contains(c),
      s"asOf: payload column $c missing from right side"))

    val leftCols = left.columns.toSeq
    val passthrough = leftCols.filterNot(keys.contains)
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap

    // One struct per right row (non-null even when every payload value is
    // NULL) keeps last(ignoreNulls) skipping only left rows — the match
    // is atomic per right row.
    val payloadStruct = org.apache.spark.sql.types.StructType(
      payload.map(c => org.apache.spark.sql.types.StructField(c, rightTypes(c))))
    val leftU = left.select(
      keys.map(col) ++
        Seq(col(leftTsCol).as("__ts"), lit(1).as("__side"),
          lit(null).cast(payloadStruct).as("__r")) ++
        passthrough.map(col): _*)
    val rightU = right.filter(col(rightTsCol).isNotNull).select(
      keys.map(col) ++
        Seq(col(rightTsCol).as("__ts"), lit(0).as("__side"),
          struct(payload.map(col): _*).as("__r")) ++
        passthrough.map(c => lit(null).cast(leftTypes(c)).as(c)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    leftU.unionByName(rightU)
      .select(
        (keys ++ passthrough).map(col) ++ Seq(col("__side"),
          last(col("__r"), ignoreNulls = true).over(w).as("__rlast")): _*)
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col("__rlast").getField(c).as(s"$outPrefix$c")): _*)
  }
}
