package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.ReferenceFunctions.kvValue

/** R1/R2 — reshape to the reference's flat KV form (SURVEY.md §2.6).
  *
  * R1: stats rows (sensor, mean, minimum, maximum) → KV rows
  * `"{sensor}:mean" → "…"` (udbf_file_analysis.py:69-83).
  * R2: a single wide row → `"{prefix}_{col}" → str(v)` pairs
  * (sens_file_analysis.py:41-55).
  *
  * Emitted as exploded (kv_key, kv_value) rows rather than a MapType so
  * the result is a plain relational table (joinable, sinkable, and
  * oracle-comparable); a KV sink can `collect_map` per key in foreachBatch.
  */
object KvReshape {

  /** R1 — stats table → KV rows. `statCols` are the stat column names
    * (e.g. mean/minimum/maximum); keys become `{sensor}:{stat}`. */
  def statsToKv(stats: DataFrame, sensorCol: String, statCols: Seq[String]): DataFrame = {
    val n = statCols.size
    val pairs = statCols.flatMap(c => Seq(s"'$c'", s"`$c`")).mkString(", ")
    stats
      .select(col(sensorCol), expr(s"stack($n, $pairs) as (stat, value)"))
      .select(
        concat(col(sensorCol), lit(":"), col("stat")).as("kv_key"),
        kvValue(col("value")).as("kv_value"))
  }

  /** R2 — each row → one KV pair per column, keyed `{prefix}_{col}`. */
  def rowToKv(df: DataFrame, prefixCol: String, valueCols: Seq[String]): DataFrame = {
    val n = valueCols.size
    val pairs = valueCols.flatMap(c => Seq(s"'$c'", s"cast(`$c` as double)")).mkString(", ")
    df.select(col(prefixCol), expr(s"stack($n, $pairs) as (field, value)"))
      .select(
        concat(col(prefixCol), lit("_"), col("field")).as("kv_key"),
        kvValue(col("value")).as("kv_value"))
  }
}
