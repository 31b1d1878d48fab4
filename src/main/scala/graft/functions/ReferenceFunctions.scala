package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression library re-expressing the reference's ad-hoc scalar
  * transforms (SURVEY.md §2.3 P1–P15, §2.4 F2–F4) as pure Catalyst
  * `Column` expressions — everything stays inside whole-stage codegen, no
  * UDFs anywhere.
  *
  * Reference citations point into /root/reference (read-only snapshot).
  */
object ReferenceFunctions {

  /** Days between 1899-12-30 (OLE automation epoch) and 1970-01-01. */
  val OleEpochDays = 25569.0

  /** P1 — OLE Automation date (days since 1899-12-30 as double) → epoch
    * microseconds. Mirrors `ole2datetime`
    * (reference conv/gantner_operations/DataConverterUDBF.py:129-140) but
    * vectorized as one arithmetic expression.
    *
    * Kept as epoch micros (BIGINT) rather than TIMESTAMP so results are
    * byte-comparable across engines; wrap with [[oleToTimestamp]] for a
    * typed column.
    */
  def oleToEpochMicros(ole: Column): Column =
    round((ole - lit(OleEpochDays)) * lit(86400.0) * lit(1e6)).cast("long")

  /** P1 — OLE date double → TIMESTAMP. */
  def oleToTimestamp(ole: Column): Column =
    timestamp_micros(oleToEpochMicros(ole))

  /** Inverse of P1 (used by tests + synthetic data): ts → OLE double. */
  def timestampToOle(ts: Column): Column =
    unix_micros(ts) / lit(86400.0 * 1e6) + lit(OleEpochDays)

  /** P3 — split a timestamp into the reference's `Datum` / `Uhrzeit` /
    * `Millisekunden` columns (DataConverterUDBF.py:173-177). */
  def datum(ts: Column): Column = date_format(ts, "yyyy-MM-dd")
  def uhrzeit(ts: Column): Column = date_format(ts, "HH:mm:ss")
  def millisekunden(ts: Column): Column = // integer div: micros → ms within second
    floor(unix_micros(ts) / 1000L).cast("long") % 1000L

  /** P4 — relative time vector: sample ordinal / sample rate
    * (DataConverterUDBF.py:119-126). `ordinal` is 0-based row index within
    * the file/group (row_number()-1 over the caller's window). */
  def relativeTime(ordinal: Column, sampleRate: Double): Column =
    ordinal.cast("double") / lit(sampleRate)

  /** P5 — channel-name normalization `-` → `_`
    * (DataConverterUDBF.py:104). */
  def normalizeChannelName(name: Column): Column = translate(name, "-", "_")

  /** P7 — filename-embedded timestamp extraction
    * (helper/utility.py:8-27): regex date + time groups, parsed with
    * hour-minute-second separated by `-`. Returns epoch seconds (BIGINT). */
  val FilenameTsPattern = """(\d{4}-\d{2}-\d{2})_(\d{2}-\d{2}-\d{2})"""
  def filenameTimestampSeconds(fname: Column): Column =
    unix_timestamp(
      to_timestamp(
        concat_ws(" ",
          regexp_extract(fname, FilenameTsPattern, 1),
          regexp_extract(fname, FilenameTsPattern, 2)),
        "yyyy-MM-dd HH-mm-ss"))

  /** P8 — decimal-comma numeric parse `"1,23"` → 1.23
    * (modbus/modbus_writer.py:114; file_analysis.py:34,72). */
  def decimalComma(s: Column): Column =
    regexp_replace(s, ",", ".").cast("double")

  /** P13 — content-hash event id: sha256 over a canonical (sorted-key)
    * JSON of the metadata fields, first 16 hex chars
    * (restapi/app_fs.py:42-51). Caller supplies the canonical JSON string
    * (field order must be lexicographic, as `json.dumps(sort_keys=True)`). */
  def eventId(canonicalJson: Column): Column =
    substring(sha2(canonicalJson, 256), 1, 16)

  /** P14 — the reference's stats rounding (BASIC_ROUNDING=3,
    * udbf_file_analysis.py:19). */
  def roundStat(c: Column): Column = round(c, 3)

  /** F2 — 10-minute-alignment predicate: a filename timestamp marks a full
    * measurement window iff minute % 10 == 0 and second == 0
    * (DataConverterUDBF.py:59-63,232-238). */
  def isTenMinuteAligned(ts: Column): Column =
    minute(ts) % 10 === 0 && second(ts) === 0

  /** F3 — size-band health predicate: healthy iff within ±10% of the
    * reference size (DataConverterUDBF.py:39-81). Returns 1/0 int health
    * flag (modbus register convention). */
  def sizeBandHealthy(size: Column, refSize: Column): Column =
    when(size.between(refSize * 0.9, refSize * 1.1), 1).otherwise(0)

  /** F4 — warm-up trim predicate: keep samples at or after 10 s of
    * relative time (drop first `rate*10` samples,
    * DataConverterUDBF.py:240-254). */
  def afterWarmup(relTime: Column): Column = relTime >= 10.0

  /** P9 — stringify for KV publish: null → empty string, double → fixed
    * 3-decimal text (sens_file_analysis.py:47-54 + BASIC_ROUNDING). */
  def kvValue(c: Column): Column =
    coalesce(format_string("%.3f", c), lit(""))
}
