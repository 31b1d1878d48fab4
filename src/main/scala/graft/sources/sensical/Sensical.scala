package graft.sources.sensical

import java.time.LocalDateTime
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter
import java.util.Locale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder

/** S4 — Sensical crack-report scan (reference: file_analysis.py:7-86).
  *
  * A report is a semi-structured German text file: a title line, a
  * `Zeit <dd-MMM-yyyy HH:mm:ss>` timestamp, a pre-computed quantile row
  * under a `q50 q90 max wCr` header, an `Anzahl erkannter Risse` crack
  * count, and a numeric block of `(X, Y, Z, wCr)` rows after a
  * `Rissposition (…) vs. …` header, terminated by `End`. Decimal commas
  * throughout (P8); rows with fewer than 4 numeric tokens are dropped
  * (F6, file_analysis.py:63-73).
  *
  * Spark shape (SURVEY.md §2.1 S4): `wholetext` scan → one typed parse
  * per file via a Generator-style flatMap — each blob becomes one report
  * row carrying a cracks ARRAY, exploded on demand by [[cracks]]. The
  * per-file parse is driver-free and embarrassingly parallel: at scale
  * each executor parses its own files; no shuffle until aggregation.
  */
object Sensical {

  final case class Crack(x: Double, y: Double, z: Double, wCr: Double)

  final case class Report(
      path: String,
      title: String,
      report_ts: java.sql.Timestamp,
      q50_mm: Option[Double],
      q90_mm: Option[Double],
      wcr_max_mm: Option[Double],
      crack_count: Option[Int],
      cracks: Seq[Crack])

  private val TimeFmt =
    DateTimeFormatter.ofPattern("d-MMM-yyyy H:mm:ss", Locale.ENGLISH)
  private val NumberRe = """[-+]?\d+(?:[.,]\d+)?""".r
  private val ZeitRe = """(?i)^\s*Zeit\s""".r
  private val QuantHdrRe = """(?i)^\s*q50\s+q90\s+max\s+wCr\s*$""".r
  private val CountRe = """(?i)Anzahl\s+erkannter\s+Risse""".r
  private val BlockRe = """(?i)Rissposition\s*\(.*\)\s*vs\.""".r

  /** P8 — decimal-comma normalization + parse. */
  private def num(s: String): Double = s.replace(',', '.').toDouble

  /** Parse one report blob; naive report time is treated as UTC (the
    * reference's convention for naive datetimes, SURVEY.md §1.2). */
  def parseReport(path: String, text: String): Report = {
    val lines = text.linesIterator.toVector
    require(lines.nonEmpty, s"empty sensical report: $path")
    def findIdx(re: scala.util.matching.Regex): Option[Int] =
      lines.indexWhere(ln => re.findFirstIn(ln).isDefined) match {
        case -1 => None
        case i  => Some(i)
      }

    val title = lines.head.trim

    val ts = findIdx(ZeitRe).map { i =>
      val raw = lines(i).split("(?i)Zeit", 2)(1).trim
      java.sql.Timestamp.from(
        LocalDateTime.parse(raw, TimeFmt).toInstant(ZoneOffset.UTC))
    }.orNull

    val (q50, q90, wcrMax) = findIdx(QuantHdrRe) match {
      case Some(i) if i + 1 < lines.length =>
        val vals = lines(i + 1).trim.split("\\s+").filter(_.nonEmpty).map(num)
        (vals.lift(0), vals.lift(1), vals.lift(2))
      case _ => (None, None, None)
    }

    val crackCount = findIdx(CountRe).flatMap { i =>
      """\d+""".r.findFirstIn(lines(i)).map(_.toInt)
    }

    val blockIdx = findIdx(BlockRe).getOrElse(
      throw new IllegalArgumentException(s"Could not find data block header: $path"))
    // lines(blockIdx + 1) is the column-header row (standardized X Y Z wCr)
    val cracks = lines.drop(blockIdx + 2).iterator
      .takeWhile(ln => !ln.trim.toLowerCase.startsWith("end"))
      .filter(_.trim.nonEmpty)
      .flatMap { ln =>
        val nums = NumberRe.findAllIn(ln).toSeq
        if (nums.length >= 4) // F6 — numeric-row gate
          Some(Crack(num(nums(0)), num(nums(1)), num(nums(2)), num(nums(3))))
        else None
      }.toVector
    if (cracks.isEmpty)
      throw new IllegalArgumentException(s"No data rows found in report: $path")

    Report(path, title, ts, q50, q90, wcrMax, crackCount, cracks)
  }

  /** One row per report file under `path`, cracks as an array column. */
  def reports(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("path"), col("value"))
      .as[(String, String)]
      .map { case (p, txt) => parseReport(p, txt) }
      .toDF()
  }

  /** One row per crack, report metadata repeated — the long/tidy form for
    * aggregation. Position columns carry the reference's unit annotations
    * (X/Y/Z in m, wCr in mm — file_analysis.py:85). */
  def cracks(spark: SparkSession, path: String): DataFrame = {
    val m = (u: String) => new MetadataBuilder().putString("unit", u).build()
    reports(spark, path)
      .select(col("path"), col("title"), col("report_ts"), col("crack_count"),
        explode(col("cracks")).as("c"))
      .select(col("path"), col("title"), col("report_ts"), col("crack_count"),
        col("c.x").as("x", m("m")),
        col("c.y").as("y", m("m")),
        col("c.z").as("z", m("m")),
        col("c.wCr").as("wcr_mm", m("mm")))
  }
}
