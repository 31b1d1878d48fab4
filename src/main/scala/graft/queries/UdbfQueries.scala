package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.ChannelStats
import graft.sources.udbf.UdbfFixtures
import QueryDef.sql

/** S1 correctness queries: decode a golden UDBF fixture through the
  * `udbf` DataSource V2 and check closed-form results. The oracle side
  * is literal VALUES (DuckDB cannot read .dat), valid because the
  * fixture is deterministic — see [[graft.sources.udbf.UdbfFixtures]].
  */
object UdbfQueries {

  val all: Seq[QueryDef] = Seq(

    // the reference's flagship spine: decode → per-channel
    // round(mean/min/max, 3) (udbf_file_analysis.py:24-91)
    sql("u01_udbf_channel_stats")(
      """SELECT sensor, cast(mean AS DOUBLE) AS mean,
        |  cast(minimum AS DOUBLE) AS minimum, cast(maximum AS DOUBLE) AS maximum
        |FROM (VALUES
        |  ('ch_a', 4.5,  0.0, 9.0),
        |  ('ch_b', 0.75, 0.0, 1.5),
        |  ('ch_c', 2.5,  2.5, 2.5)) AS t(sensor, mean, minimum, maximum)
        |ORDER BY sensor""") { (s, _) =>
      val df = s.read.format("udbf").load(UdbfFixtures.ensure())
      ChannelStats(df, Seq("ch_a", "ch_b", "ch_c"))
    },

    // decode shape: row count and first/last decoded timestamps
    sql("u02_udbf_decode_shape")(
      """SELECT cast(6000 AS BIGINT) AS n_rows,
        |  '2024-03-15 12:00:00.000' AS first_ts,
        |  '2024-03-15 12:00:59.990' AS last_ts""") { (s, _) =>
      val df = s.read.format("udbf").load(UdbfFixtures.ensure())
      df.agg(
        count(lit(1)).as("n_rows"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSS").as("first_ts"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSS").as("last_ts"))
    }
  )
}
