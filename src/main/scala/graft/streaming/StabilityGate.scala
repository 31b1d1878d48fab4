package graft.streaming

import java.nio.file.{Files, Path, StandardCopyOption}
import java.time.LocalDateTime
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter
import scala.collection.mutable
import scala.jdk.CollectionConverters._
import scala.util.matching.Regex

/** T2 + T3 — file-stability admission gate with oldest-first ordering
  * (conv/scripts/Pipeline.py:96-160).
  *
  * A file is admitted only when BOTH hold (Pipeline.py:96-119):
  *   - its (size, mtime) stat has been observed identical on at least
  *     `stableChecks` consecutive polls (any change resets the count);
  *   - its mtime is older than `minFileAgeMs` (files younger than the
  *     age gate still accumulate stability counts but are never
  *     admitted, exactly like the reference's early-return branch).
  *
  * Among stable candidates the one with the OLDEST filename-embedded
  * timestamp is admitted first — one per poll, mirroring schedule_next
  * (Pipeline.py:135-160); timestamp extraction per helper/utility.py:
  * 8-27 (two regex groups joined by a space, mtime fallback).
  *
  * Spark has no built-in for this (SURVEY.md §7.4): the gate runs as a
  * staging janitor that MOVES admitted files into the directory a
  * Structured Streaming file source watches — admission order becomes
  * arrival order for the stream. `clock` is injectable so the age gate
  * is testable without sleeping.
  */
final class StabilityGate(
    inputDir: Path,
    stagingDir: Path,
    timestampRe: Regex = StabilityGate.DefaultTimestampRe,
    timestampFmt: String = StabilityGate.DefaultTimestampFmt,
    stableChecks: Int = graft.core.GraftConfig.stableChecks,
    minFileAgeMs: Long = graft.core.GraftConfig.minFileAgeMs,
    clock: () => Long = () => System.currentTimeMillis) {

  import StabilityGate.StatInfo
  private val seen = mutable.Map.empty[Path, StatInfo]
  private val fmt = DateTimeFormatter.ofPattern(timestampFmt)

  Files.createDirectories(stagingDir)

  /** P7 — filename timestamp; falls back to mtime (utility.py:20-27). */
  private[streaming] def extractTs(p: Path): Option[Long] =
    timestampRe.findFirstMatchIn(p.getFileName.toString) match {
      case Some(m) if m.groupCount >= 2 =>
        scala.util.Try(LocalDateTime.parse(s"${m.group(1)} ${m.group(2)}", fmt)
          .toInstant(ZoneOffset.UTC).toEpochMilli).toOption
      case _ =>
        scala.util.Try(Files.getLastModifiedTime(p).toMillis).toOption
    }

  private def isStable(p: Path): Boolean = {
    val st = try {
      Some((Files.size(p), Files.getLastModifiedTime(p).toMillis))
    } catch {
      case _: java.nio.file.NoSuchFileException => seen.remove(p); None
      case _: java.io.IOException => None
    }
    st match {
      case None => false
      case Some((size, mtime)) =>
        val tooYoung = (clock() - mtime) < minFileAgeMs
        seen.get(p) match {
          case Some(prev) if prev.size == size && prev.mtime == mtime =>
            prev.stableCount += 1
          case _ =>
            seen(p) = StatInfo(size, mtime, 1)
        }
        !tooYoung && seen(p).stableCount >= stableChecks
    }
  }

  /** One scan: admit (move to staging) the oldest stable candidate, if
    * any. Returns the staged path. */
  def poll(): Option[Path] = {
    val files =
      if (Files.isDirectory(inputDir))
        Files.list(inputDir).iterator().asScala.filter(Files.isRegularFile(_)).toVector
      else Vector.empty
    val candidates = files.flatMap { p =>
      extractTs(p) match {
        case Some(ts) if isStable(p) => Some((ts, p))
        case _ => None
      }
    }
    candidates.sortBy { case (ts, p) => (ts, p.toString) }.headOption.map {
      case (_, p) =>
        val dest = stagingDir.resolve(p.getFileName)
        Files.move(p, dest, StandardCopyOption.REPLACE_EXISTING)
        seen.remove(p)
        dest
    }
  }

  /** Drain: poll until no more admissions (admission order = oldest
    * first, one move per poll, so staged mtimes preserve the order). */
  def pollAll(): Seq[Path] =
    Iterator.continually(poll()).takeWhile(_.isDefined).flatten.toSeq
}

object StabilityGate {
  /** The LPI/SENS/MIST filename patterns (conv/main_lpi.py:15-16 et al). */
  val DefaultTimestampRe: Regex = """(\d{4}-\d{2}-\d{2})_(\d{2}-\d{2}-\d{2})""".r
  val DefaultTimestampFmt = "yyyy-MM-dd HH-mm-ss"

  private[streaming] final case class StatInfo(
      size: Long, mtime: Long, var stableCount: Int)
}
