package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.ReferenceFunctions._
import graft.operators.{ChannelStats, KvReshape, LatestRow}
import QueryDef.sql

/** Reference-semantics operators (SURVEY.md §2) verified against the
  * DuckDB oracle on the synthetic corpus. Each query exercises one or
  * more inventory items (P/F/A/R/D ids cited per query).
  */
object ReferenceQueries {

  val all: Seq[QueryDef] = Seq(

    // A1+R3+F5+P14 — per-channel mean/min/max, the reference's flagship
    // aggregation (DataConverterUDBF.py:213-282).
    sql("r01_channel_stats")(
      """SELECT sensor,
        |  round(avg(value), 3) AS mean,
        |  round(min(value), 3) AS minimum,
        |  round(max(value), 3) AS maximum
        |FROM (
        |  SELECT 'l_quantity' AS sensor, l_quantity AS value FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem) t
        |GROUP BY sensor
        |ORDER BY sensor""") { (s, d) =>
      ChannelStats(Tables.lineitem(s, d),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    },

    // §2.5 extended stats vocabulary (mapping.json:1939-2513): stddev,
    // exact percentiles, NaN/null counts.
    sql("r02_extended_stats")(
      """SELECT sensor,
        |  round(avg(value), 3) AS mean,
        |  round(stddev_samp(value), 3) AS std,
        |  round(quantile_cont(value, 0.5), 3) AS p50,
        |  round(quantile_cont(value, 0.9), 3) AS p90,
        |  cast(sum(CASE WHEN isnan(value) THEN 1 ELSE 0 END) AS BIGINT) AS number_of_nans,
        |  cast(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS number_of_nulls
        |FROM (
        |  SELECT 'l_quantity' AS sensor, l_quantity AS value FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem) t
        |GROUP BY sensor
        |ORDER BY sensor""") { (s, d) =>
      // exact percentiles here: the DuckDB oracle computes quantile_cont
      ChannelStats.extended(Tables.lineitem(s, d), Seq("l_quantity", "l_discount"),
        exact = true)
    },

    // A2/O1 — deterministic latest-row per group (sens_file_analysis.py:66-90)
    sql("r03_latest_event_per_user")(
      """SELECT user_id, event_id, event_type, round(value, 4) AS value
        |FROM (SELECT user_id, event_id, event_type, value,
        |        row_number() OVER (PARTITION BY user_id
        |                           ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1
        |ORDER BY user_id""") { (s, d) =>
      LatestRow.perGroup(Tables.events(s, d), Seq("user_id"), "ts", "event_id")
        .select(col("user_id"), col("event_id"), col("event_type"),
          round(col("value"), 4).as("value"))
        .orderBy(col("user_id"))
    },

    // P1 — OLE Automation date → timestamp (DataConverterUDBF.py:129-140).
    // Epoch-micros output keeps the compare engine-neutral.
    sql("r04_ole_timestamp")(
      """SELECT event_id,
        |  round((45000.0 + value / 100.0 - 25569.0) * 86400.0 * 1e6)::BIGINT AS ts_micros
        |FROM events
        |ORDER BY event_id""") { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          oleToEpochMicros(lit(45000.0) + col("value") / 100.0).as("ts_micros"))
        .orderBy(col("event_id"))
    },

    // P3 — Datum / Uhrzeit / Millisekunden split (DataConverterUDBF.py:173-177)
    sql("r05_time_split")(
      """SELECT event_id,
        |  strftime(ts, '%Y-%m-%d') AS datum,
        |  strftime(ts, '%H:%M:%S') AS uhrzeit,
        |  (epoch_us(ts) // 1000) % 1000 AS millisekunden
        |FROM events
        |ORDER BY event_id""") { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          datum(col("ts")).as("datum"),
          uhrzeit(col("ts")).as("uhrzeit"),
          millisekunden(col("ts")).as("millisekunden"))
        .orderBy(col("event_id"))
    },

    // P7 — filename-timestamp extraction (helper/utility.py:8-27): build a
    // logger-style filename, then recover the timestamp from it by regex.
    sql("r06_filename_timestamp")(
      """SELECT fname,
        |  epoch(strptime(
        |    regexp_extract(fname, '(\d{4}-\d{2}-\d{2})_(\d{2}-\d{2}-\d{2})', 1)
        |      || ' ' ||
        |    regexp_extract(fname, '(\d{4}-\d{2}-\d{2})_(\d{2}-\d{2}-\d{2})', 2),
        |    '%Y-%m-%d %H-%M-%S'))::BIGINT AS ts_seconds
        |FROM (SELECT 'lpi_100hz_' || strftime(ts, '%Y-%m-%d_%H-%M-%S') || '.dat' AS fname
        |      FROM events WHERE event_id < 500) t
        |ORDER BY fname""") { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 500)
        .select(concat(lit("lpi_100hz_"),
          date_format(col("ts"), "yyyy-MM-dd_HH-mm-ss"), lit(".dat")).as("fname"))
        .select(col("fname"), filenameTimestampSeconds(col("fname")).as("ts_seconds"))
        .orderBy(col("fname"))
    },

    // P8 — decimal-comma parse (modbus_writer.py:114): fixed-format text
    // with ',' decimal separator → double.
    sql("r07_decimal_comma")(
      """SELECT event_id, raw, round(replace(raw, ',', '.')::DOUBLE, 2) AS parsed
        |FROM (SELECT event_id, replace(printf('%.2f', value), '.', ',') AS raw
        |      FROM events) t
        |ORDER BY event_id""") { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          translate(format_string("%.2f", col("value")), ".", ",").as("raw"))
        .select(col("event_id"), col("raw"),
          round(decimalComma(col("raw")), 2).as("parsed"))
        .orderBy(col("event_id"))
    },

    // P13 — content-hash event id: sha256(canonical json)[:16]
    // (restapi/app_fs.py:42-51).
    sql("r08_event_content_id")(
      """SELECT event_id,
        |  substring(sha256('{"created_at":"' || strftime(ts, '%Y-%m-%d %H:%M:%S')
        |    || '","data_url":"https://example.invalid/' || event_id
        |    || '","message_type":"' || event_type || '"}'), 1, 16) AS content_id
        |FROM events
        |ORDER BY event_id""") { (s, d) =>
      val canonical = concat(
        lit("{\"created_at\":\""), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
        lit("\",\"data_url\":\"https://example.invalid/"), col("event_id").cast("string"),
        lit("\",\"message_type\":\""), col("event_type"), lit("\"}"))
      Tables.events(s, d)
        .select(col("event_id"), eventId(canonical).as("content_id"))
        .orderBy(col("event_id"))
    },

    // F2 — 10-minute-alignment predicate (DataConverterUDBF.py:59-63)
    sql("r09_aligned_windows")(
      """SELECT event_type, count(*) AS aligned_n
        |FROM events
        |WHERE minute(ts) % 10 = 0 AND second(ts) = 0
        |GROUP BY event_type
        |ORDER BY event_type""") { (s, d) =>
      Tables.events(s, d)
        .filter(isTenMinuteAligned(col("ts")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("aligned_n"))
        .orderBy(col("event_type"))
    },

    // F3 — size-band health flag (DataConverterUDBF.py:39-81), n_chars
    // standing in for file size with a per-source reference size.
    sql("r10_size_band_health")(
      """SELECT source,
        |  cast(sum(CASE WHEN n_chars BETWEEN 0.9 * 300 AND 1.1 * 300
        |                THEN 1 ELSE 0 END) AS BIGINT) AS healthy_n,
        |  count(*) AS n
        |FROM documents
        |GROUP BY source
        |ORDER BY source""") { (s, d) =>
      Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(
          sum(sizeBandHealthy(col("n_chars"), lit(300)).cast("long")).as("healthy_n"),
          count(lit(1)).as("n"))
        .orderBy(col("source"))
    },

    // F4+P4 — warm-up trim: drop the first 10 s (10 samples at 1 Hz) per
    // group before computing stats (DataConverterUDBF.py:240-254).
    // The mean aggregates DECIMAL(18,6)-cast values: decimal addition is
    // exact and order-independent, so partial-aggregation order can never
    // put a group mean on the 3-dp rounding knife edge differently than
    // the oracle's sequential sum (observed once at sf0.1 with doubles).
    sql("r11_warmup_trimmed_stats")(
      """SELECT user_id, count(*) AS n_after_trim,
        |  round(avg(value::DECIMAL(18,6)), 3)::DOUBLE AS mean
        |FROM (SELECT user_id, value,
        |        (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1)
        |          / 1.0 AS rel_time
        |      FROM events) t
        |WHERE rel_time >= 10.0
        |GROUP BY user_id
        |ORDER BY user_id""") { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("rel_time", relativeTime(row_number().over(w) - 1, 1.0))
        .filter(afterWarmup(col("rel_time")))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_after_trim"),
          round(avg(col("value").cast("decimal(18,6)")), 3).cast("double").as("mean"))
        .orderBy(col("user_id"))
    },

    // R1 — stats table → KV rows "{sensor}:{stat}" (udbf_file_analysis.py:69-83)
    sql("r12_stats_kv")(
      """SELECT sensor || ':' || stat AS kv_key, printf('%.3f', v) AS kv_value
        |FROM (
        |  SELECT sensor, round(avg(value), 3) AS mean, round(min(value), 3) AS minimum,
        |         round(max(value), 3) AS maximum
        |  FROM (SELECT 'l_quantity' AS sensor, l_quantity AS value FROM lineitem
        |        UNION ALL SELECT 'l_tax', l_tax FROM lineitem) t
        |  GROUP BY sensor) stats
        |UNPIVOT (v FOR stat IN (mean, minimum, maximum))
        |ORDER BY kv_key""") { (s, d) =>
      val stats = ChannelStats(Tables.lineitem(s, d), Seq("l_quantity", "l_tax"))
      KvReshape.statsToKv(stats, "sensor", Seq("mean", "minimum", "maximum"))
        .orderBy(col("kv_key"))
    },

    // D5 — monotonic-append filter: keep rows strictly above the running
    // prefix max (PyQStationConnectWin.py:400-411 chunk-concat semantics).
    sql("r13_monotonic_prefix")(
      """SELECT user_id, event_id
        |FROM (SELECT user_id, event_id, value,
        |        max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |      FROM events) t
        |WHERE prev_max IS NULL OR value > prev_max
        |ORDER BY user_id, event_id""") { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .withColumn("prev_max", max(col("value")).over(w))
        .filter(col("prev_max").isNull || col("value") > col("prev_max"))
        .select(col("user_id"), col("event_id"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // §2.5 — NaN / null / z-score outlier counting (mapping.json
    // number_of_nans / number_of_outliers vocabulary).
    sql("r14_outlier_counts")(
      """SELECT event_type,
        |  cast(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  cast(sum(CASE WHEN isnan(value) THEN 1 ELSE 0 END) AS BIGINT) AS n_nan,
        |  cast(sum(CASE WHEN abs(value - avg_v) > 2 * sd_v THEN 1 ELSE 0 END) AS BIGINT) AS n_outlier
        |FROM (SELECT event_type, value,
        |        avg(value) OVER (PARTITION BY event_type) AS avg_v,
        |        stddev_samp(value) OVER (PARTITION BY event_type) AS sd_v
        |      FROM events) t
        |GROUP BY event_type
        |ORDER BY event_type""") { (s, d) =>
      // scale-safe: per-type avg/stddev as a TINY groupBy aggregate
      // broadcast-joined back, not a window over few skewed keys (a
      // window would funnel every row of a key through one partition)
      val events = Tables.events(s, d)
      val typeStats = events.groupBy(col("event_type"))
        .agg(avg(col("value")).as("avg_v"), stddev_samp(col("value")).as("sd_v"))
      events.join(broadcast(typeStats), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(
          sum(when(col("value").isNull, 1).otherwise(0)).as("n_null"),
          sum(when(isnan(col("value")), 1).otherwise(0)).as("n_nan"),
          sum(when(abs(col("value") - col("avg_v")) > col("sd_v") * 2, 1).otherwise(0)).as("n_outlier"))
        .orderBy(col("event_type"))
    },

    // J1 — stats-KV ⋈ register mapping broadcast join
    // (modbus_writer.py:105-117): inner-join semantics, missing fields skipped.
    sql("r15_register_join")(
      """SELECT m.register, k.kv_key, k.kv_value
        |FROM (SELECT sensor || ':' || stat AS kv_key, printf('%.3f', v) AS kv_value
        |      FROM (SELECT sensor, round(avg(value), 3) AS mean,
        |                   round(min(value), 3) AS minimum, round(max(value), 3) AS maximum
        |            FROM (SELECT 'l_quantity' AS sensor, l_quantity AS value FROM lineitem
        |                  UNION ALL SELECT 'l_tax', l_tax FROM lineitem) t
        |            GROUP BY sensor) stats
        |      UNPIVOT (v FOR stat IN (mean, minimum, maximum))) k
        |JOIN (VALUES ('l_quantity:mean', 100), ('l_quantity:max', 102),
        |             ('l_tax:mean', 104), ('missing:field', 106)) m(field, register)
        |  ON k.kv_key = m.field
        |ORDER BY m.register""") { (s, d) =>
      import s.implicits._
      val stats = ChannelStats(Tables.lineitem(s, d), Seq("l_quantity", "l_tax"))
      val kv = KvReshape.statsToKv(stats, "sensor", Seq("mean", "minimum", "maximum"))
      val mapping = Seq(("l_quantity:mean", 100), ("l_quantity:max", 102),
        ("l_tax:mean", 104), ("missing:field", 106)).toDF("field", "register")
      kv.join(broadcast(mapping), col("kv_key") === col("field"))
        .select(col("register"), col("kv_key"), col("kv_value"))
        .orderBy(col("register"))
    },

    // P12 — window-end + UTC→Europe/Berlin shift and the Allsat partner
    // filename (udbf_file_analysis.py:135-143); events span DST edges so
    // both +01:00 and +02:00 offsets are exercised.
    sql("r16_window_end_berlin")(
      """SELECT event_id,
        |  'FHEB_' || strftime((ts + INTERVAL 10 MINUTE) AT TIME ZONE 'UTC'
        |    AT TIME ZONE 'Europe/Berlin', '%Y_%m_%d_%H_%M_%S') || '.csv' AS allsat_name
        |FROM events
        |WHERE event_id < 1000
        |ORDER BY event_id""") { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 1000)
        .select(col("event_id"), allsatName(col("ts")).as("allsat_name"))
        .orderBy(col("event_id"))
    },

    // F7 — sample-rate health-key routing (udbf_file_analysis.py:57-62);
    // the '100hz' branch must win before the '1hz' substring check.
    sql("r17_sample_rate_routing")(
      """SELECT fname,
        |  CASE WHEN contains(lower(fname), '100hz') THEN 'health:lpi_100hz_file_size'
        |       WHEN contains(lower(fname), '1hz') THEN 'health:lpi_1hz_file_size'
        |       ELSE NULL END AS health_key
        |FROM (SELECT CASE WHEN event_id % 3 = 0 THEN 'FHE_100Hz_' || event_id || '.dat'
        |                  WHEN event_id % 3 = 1 THEN 'FHE_1Hz_' || event_id || '.dat'
        |                  ELSE 'FHE_other_' || event_id || '.dat' END AS fname
        |      FROM events WHERE event_id < 300) t
        |ORDER BY fname""") { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 300)
        .select(concat(
          when(col("event_id") % 3 === 0, "FHE_100Hz_")
            .when(col("event_id") % 3 === 1, "FHE_1Hz_")
            .otherwise("FHE_other_"),
          col("event_id").cast("string"), lit(".dat")).as("fname"))
        .select(col("fname"), healthKeyForRate(col("fname")).as("health_key"))
        .orderBy(col("fname"))
    },

    // F8 — alarm predicate: *_GAL/*_RAL channels whose max flag is 1
    // (udbf_file_analysis.py:99-100), over synthesized channel names.
    sql("r18_alarm_channels")(
      """SELECT channel, cast(max(flag) AS DOUBLE) AS max_flag
        |FROM (SELECT 'ch_' || (user_id % 7) ||
        |        CASE WHEN user_id % 3 = 0 THEN '_GAL'
        |             WHEN user_id % 3 = 1 THEN '_RAL' ELSE '_VAL' END AS channel,
        |        CASE WHEN value > 0.9 THEN 1.0 ELSE 0.0 END AS flag
        |      FROM events) t
        |GROUP BY channel
        |HAVING (ends_with(channel, '_GAL') OR ends_with(channel, '_RAL'))
        |   AND max(flag) = 1.0
        |ORDER BY channel""") { (s, d) =>
      Tables.events(s, d)
        .select(concat(lit("ch_"), (col("user_id") % 7).cast("string"),
          when(col("user_id") % 3 === 0, "_GAL")
            .when(col("user_id") % 3 === 1, "_RAL")
            .otherwise("_VAL")).as("channel"),
          when(col("value") > 0.9, 1.0).otherwise(0.0).as("flag"))
        .groupBy(col("channel"))
        .agg(max(col("flag")).as("max_flag"))
        .filter(isAlarmChannel(col("channel"), col("max_flag")))
        .orderBy(col("channel"))
    },

    // F9 — URL-shape gate (restapi/app_fs.py:17,72-73): scheme check is
    // case-insensitive, non-http(s) schemes rejected.
    sql("r19_url_gate")(
      """SELECT url FROM (
        |  SELECT CASE WHEN doc_id % 4 = 0 THEN 'https://example.org/m/' || doc_id
        |              WHEN doc_id % 4 = 1 THEN 'HTTP://example.org/m/' || doc_id
        |              WHEN doc_id % 4 = 2 THEN 'ftp://example.org/m/' || doc_id
        |              ELSE 'not a url ' || doc_id END AS url
        |  FROM documents) t
        |WHERE regexp_matches(url, '^(?i)https?://')
        |ORDER BY url""") { (s, d) =>
      Tables.documents(s, d)
        .select(
          when(col("doc_id") % 4 === 0, concat(lit("https://example.org/m/"), col("doc_id")))
            .when(col("doc_id") % 4 === 1, concat(lit("HTTP://example.org/m/"), col("doc_id")))
            .when(col("doc_id") % 4 === 2, concat(lit("ftp://example.org/m/"), col("doc_id")))
            .otherwise(concat(lit("not a url "), col("doc_id"))).as("url"))
        .filter(isValidMetadataUrl(col("url")))
        .orderBy(col("url"))
    },

    // F1 — file-type suffix gate, case-insensitive, dotless names rejected
    // (udbf_file_analysis.py:38-44; sens_file_analysis.py:13-29).
    sql("r20_filetype_gate")(
      """SELECT fname FROM (
        |  SELECT CASE WHEN doc_id % 5 = 0 THEN 'f' || doc_id || '.dat'
        |              WHEN doc_id % 5 = 1 THEN 'f' || doc_id || '.PARQUET'
        |              WHEN doc_id % 5 = 2 THEN 'f' || doc_id || '.Csv'
        |              WHEN doc_id % 5 = 3 THEN 'f' || doc_id || '.txt'
        |              ELSE 'f' || doc_id END AS fname
        |  FROM documents) t
        |WHERE lower(regexp_extract(fname, '(\.[^.]*)$', 1)) IN ('.dat', '.csv', '.parquet')
        |ORDER BY fname""") { (s, d) =>
      Tables.documents(s, d)
        .select(
          when(col("doc_id") % 5 === 0, concat(lit("f"), col("doc_id"), lit(".dat")))
            .when(col("doc_id") % 5 === 1, concat(lit("f"), col("doc_id"), lit(".PARQUET")))
            .when(col("doc_id") % 5 === 2, concat(lit("f"), col("doc_id"), lit(".Csv")))
            .when(col("doc_id") % 5 === 3, concat(lit("f"), col("doc_id"), lit(".txt")))
            .otherwise(concat(lit("f"), col("doc_id"))).as("fname"))
        .filter(hasSupportedSuffix(col("fname"), Seq(".dat", ".csv", ".parquet")))
        .orderBy(col("fname"))
    },

    // A3 — newest-file-by-mtime per directory via max_by over a synthetic
    // file listing (uploader/main.py:35-42; app_fs.py:137), unique mtimes
    // by construction so the argmax is deterministic.
    sql("r21_newest_file_per_dir")(
      """SELECT dir, max_by(path, mtime_k) AS newest
        |FROM (SELECT '/data/' || event_type AS dir,
        |             '/data/' || event_type || '/' || event_id || '.dat' AS path,
        |             epoch(ts)::BIGINT * 100000 + event_id AS mtime_k
        |      FROM events) t
        |GROUP BY dir
        |ORDER BY dir""") { (s, d) =>
      Tables.events(s, d)
        .select(concat(lit("/data/"), col("event_type")).as("dir"),
          concat(lit("/data/"), col("event_type"), lit("/"),
            col("event_id"), lit(".dat")).as("path"),
          (unix_timestamp(col("ts")) * 100000L + col("event_id")).as("mtime_k"))
        .groupBy(col("dir"))
        .agg(max_by(col("path"), col("mtime_k")).as("newest"))
        .orderBy(col("dir"))
    },

    // A4/O3 — oldest-candidate selection via min_by (Pipeline.py:145-160)
    sql("r22_oldest_candidate")(
      """SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
        |FROM (SELECT user_id, event_id, ts,
        |        row_number() OVER (ORDER BY ts, event_id) AS rn
        |      FROM events) t
        |WHERE rn = 1""") { (s, d) =>
      import graft.operators.LatestRow
      LatestRow.oldest(
        Tables.events(s, d).select(col("user_id"), col("event_id"), col("ts")),
        "ts", "event_id")
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
    }
  )
}
