package graft.apps

import java.nio.file.{Path, Paths}
import java.time.LocalDateTime
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.ChannelStats
import graft.sinks.{CsvSink, KvSink}

/** The LPI `.dat` analysis — udbf_file_analysis.py:24-91 as a Spark
  * batch over one admitted file:
  *
  *   F1 suffix gate → F3/F7 size-band health by sample-rate routing →
  *   S1 udbf decode → F2 filename-alignment check → F4 warm-up trim
  *   (first 10 s dropped for cut files) → F5 (ts excluded by
  *   construction) → A1 round(mean/min/max, 3) per channel →
  *   K1 `<stem>_stats.csv` (capitalized header, reference format
  *   DataConverterUDBF.py:260-265) → K3 `stats:<stem>` KV hash with
  *   `{sensor}:mean/min/max` fields, TTL 60 (udbf_file_analysis.py:69-87)
  *   with the A7 empty-mapping guard.
  *
  * Archive/dead-letter (K7/T7) belongs to the enclosing
  * [[graft.streaming.FilePipeline]].
  */
final class LpiAnalysis(
    spark: SparkSession,
    statsDir: String,
    kv: KvSink,
    refSizesKb: Map[String, Double] = Map(
      "100hz" -> graft.core.GraftConfig.refFileSize100HzKb,
      "1hz" -> graft.core.GraftConfig.refFileSize1HzKb),
    ttlSeconds: Long = graft.core.GraftConfig.basicTtlSeconds) {

  import LpiAnalysis._

  def processFile(file: String): Unit = {
    val p = Paths.get(file)
    val name = p.getFileName.toString
    require(name.toLowerCase.endsWith(".dat"), s"Called on non-.dat file: $file") // F1
    val stem = name.stripSuffix(".dat").stripSuffix(".DAT")
    val aligned = isAligned(name)

    // F3 + F7 — size-band health, keyed by the filename's sample rate;
    // cut files and unknown rates never alarm (DataConverterUDBF.py:39-81)
    rateOf(name).foreach { rate =>
      val health: Int =
        if (!aligned) 0
        else refSizesKb.get(rate).map { refKb =>
          val bytes = java.nio.file.Files.size(p).toDouble
          val ref = refKb * 1000
          if (bytes >= ref * 0.9 && bytes <= ref * 1.1) 0 else 1
        }.getOrElse(0)
      kv.set(s"health:lpi_${rate}_file_size", health.toString, Some(ttlSeconds))
    }

    val df = spark.read.format("udbf").load(file)
    val channels = df.columns.filterNot(_ == "ts").toSeq // F5

    // F4 — warm-up trim: cut files drop their first 10 seconds
    // (sample_rate * 10 rows ≡ ts < min(ts) + 10 s for a monotone clock)
    val trimmed =
      if (aligned) df
      else {
        val firstTs = df.agg(min(col("ts"))).head().getTimestamp(0)
        df.filter(col("ts") >= lit(new java.sql.Timestamp(firstTs.getTime + 10000L)))
      }

    val stats = ChannelStats(trimmed, channels) // A1, round 3 (P14)

    // K1 — reference CSV format: Sensor,Mean,Minimum,Maximum
    CsvSink.writeSingleCsv(
      stats.select(col("sensor").as("Sensor"), col("mean").as("Mean"),
        col("minimum").as("Minimum"), col("maximum").as("Maximum")),
      Paths.get(statsDir, s"${stem}_stats.csv"))

    // K3 — stats:<stem> hash; control-plane collect, contractually one
    // row per channel of THIS file (ChannelStats groups by sensor name)
    val mapping = graft.core.Bounded
      .collect(stats, channels.size, "LpiAnalysis.stats").flatMap { r =>
      val sensor = r.getString(0)
      Seq(s"$sensor:mean" -> r.getDouble(1).toString,
        s"$sensor:min" -> r.getDouble(2).toString,
        s"$sensor:max" -> r.getDouble(3).toString)
    }.toMap
    if (mapping.nonEmpty) // A7
      kv.hset(s"stats:$stem", mapping, Some(ttlSeconds))
  }
}

object LpiAnalysis {
  private val TsRe = """(\d{4}-\d{2}-\d{2})_(\d{2}-\d{2}-\d{2})""".r
  private val TsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH-mm-ss")

  /** F2 — a file is a full (uncut) 10-minute window iff its filename
    * timestamp sits on a 10-minute boundary; unparsable names count as
    * cut (DataConverterUDBF.py:232-238). */
  def isAligned(fileName: String): Boolean =
    TsRe.findFirstMatchIn(fileName).exists { m =>
      val ts = LocalDateTime.parse(s"${m.group(1)} ${m.group(2)}", TsFmt)
      ts.getMinute % 10 == 0 && ts.getSecond == 0
    }

  /** F7 — sample-rate routing from the filename
    * (udbf_file_analysis.py:57-62). */
  def rateOf(fileName: String): Option[String] = {
    val lower = fileName.toLowerCase
    if (lower.contains("100hz")) Some("100hz")
    else if (lower.contains("1hz")) Some("1hz")
    else None
  }
}
