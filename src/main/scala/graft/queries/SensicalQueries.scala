package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.sensical.{Sensical, SensicalFixtures}
import QueryDef.sql

/** S4 correctness: parse the deterministic Sensical crack report
  * (fixture mirrors every parse edge of file_analysis.py:7-86) and check
  * meta + crack rows against a literal VALUES oracle. */
object SensicalQueries {

  val all: Seq[QueryDef] = Seq(

    sql("u03_sensical_cracks")(
      """SELECT title, report_ts, cast(crack_count AS INT) AS crack_count,
        |  cast(x AS DOUBLE) AS x, cast(y AS DOUBLE) AS y,
        |  cast(z AS DOUBLE) AS z, cast(wcr_mm AS DOUBLE) AS wcr_mm
        |FROM (VALUES
        |  ('Bauwerk R6-07 - Sensor Nord', '2025-04-22 12:26:43', 6, 1.0, 2.0, 0.1, 0.10),
        |  ('Bauwerk R6-07 - Sensor Nord', '2025-04-22 12:26:43', 6, 2.5, 2.0, 0.1, 0.20),
        |  ('Bauwerk R6-07 - Sensor Nord', '2025-04-22 12:26:43', 6, 4.0, 2.1, 0.2, 0.35),
        |  ('Bauwerk R6-07 - Sensor Nord', '2025-04-22 12:26:43', 6, 5.5, 2.1, 0.2, 0.45),
        |  ('Bauwerk R6-07 - Sensor Nord', '2025-04-22 12:26:43', 6, 7.0, 2.2, 0.3, 0.80),
        |  ('Bauwerk R6-07 - Sensor Nord', '2025-04-22 12:26:43', 6, 8.5, 2.2, 0.3, 1.08))
        |  AS t(title, report_ts, crack_count, x, y, z, wcr_mm)
        |ORDER BY x""") { (s, _) =>
      Sensical.cracks(s, SensicalFixtures.ensure())
        .select(col("title"),
          date_format(col("report_ts"), "yyyy-MM-dd HH:mm:ss").as("report_ts"),
          col("crack_count"), col("x"), col("y"), col("z"), col("wcr_mm"))
        .orderBy(col("x"))
    },

    // A5 — recompute the report's own quantile vocabulary from raw rows
    // (percentile over crack widths; file_analysis.py:31-45 extracts what
    // an upstream system computed — here we verify we can DERIVE it)
    sql("u04_sensical_quantiles")(
      """SELECT cast(6 AS BIGINT) AS n_cracks,
        |  cast(0.4 AS DOUBLE) AS q50, cast(1.08 AS DOUBLE) AS wcr_max""") { (s, _) =>
      Sensical.cracks(s, SensicalFixtures.ensure())
        .agg(count(lit(1)).as("n_cracks"),
          round(expr("percentile(wcr_mm, 0.5)"), 4).as("q50"),
          round(max(col("wcr_mm")), 4).as("wcr_max"))
    }
  )
}
