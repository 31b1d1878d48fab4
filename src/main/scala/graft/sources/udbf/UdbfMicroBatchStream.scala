package graft.sources.udbf

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.time.LocalDateTime
import java.time.ZoneOffset

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.types.StructType

/** Streaming offset = length of the admitted-file log: batch (start,
  * end] reads log entries [start.index, end.index). Monotone by
  * construction (the log is append-only). */
final case class UdbfOffset(index: Long) extends Offset {
  override def json(): String = s"""{"index":$index}"""
}

/** `spark.readStream.format("udbf")` — the SURVEY §7.4 "faithful"
  * option: a DSv2 micro-batch source whose ADMISSION CONTROL carries
  * the T2 stability gate in-source, instead of a janitor process
  * ([[graft.streaming.StabilityGate]] — which remains the documented
  * fallback for feeding the built-in file source).
  *
  * Gate semantics (Pipeline.py:96-160, same contract the janitor
  * implements):
  *   - a `.dat` file is admissible only after its (size, mtime) stat
  *     has been observed IDENTICAL on `stableChecks` consecutive
  *     `latestOffset` polls (any change resets the count) AND its
  *     mtime is at least `minFileAgeMs` old — a logger mid-write is
  *     held back, never half-read (T2);
  *   - among admissible candidates, oldest filename-embedded timestamp
  *     first (mtime fallback), name as tiebreak (T3);
  *   - the per-trigger file cap comes from Spark's admission-control
  *     [[ReadLimit]] (`maxFilesPerTrigger` option → [[ReadMaxFiles]]).
  *
  * Exactly-once across restarts (D1): the admission ORDER is the
  * source of truth, persisted as an append-only log under the query's
  * checkpoint location before an offset ever exposes it. On restart
  * the log is replayed, so a committed batch's (start, end) range maps
  * to the same files forever; files never re-admit (the log is the
  * dedup set).
  *
  * Scale shape: polling lists the directory (one RPC per poll — the
  * same cost the built-in file source pays); per-file stat history is
  * one small record per UNADMITTED file, dropped on admission. Decode
  * work is the batch reader's ([[UdbfCursor]] — full projection
  * pushdown, one partition per bounded 10-minute file). */
final class UdbfMicroBatchStream(
    paths: Seq[String], required: StructType, chunkFrames: Int,
    checkpointLocation: String, stableChecks: Int, minFileAgeMs: Long,
    maxFilesPerTrigger: Int, clock: () => Long = () => System.currentTimeMillis)
    extends MicroBatchStream with SupportsAdmissionControl {

  private val conf = new Configuration()

  // ---- admitted-file log (restart source of truth) -------------------
  private val logPath = {
    // Spark hands the per-source checkpoint dir as a URI ("file:/…");
    // Paths.get on the raw string would treat the scheme as a relative
    // path segment and drop the log somewhere under the CWD
    val dir = scala.util.Try(Paths.get(new java.net.URI(checkpointLocation)))
      .getOrElse(Paths.get(checkpointLocation))
    Files.createDirectories(dir)
    dir.resolve("udbf-admitted.log")
  }
  private val admitted: mutable.ArrayBuffer[String] = {
    val buf = mutable.ArrayBuffer.empty[String]
    if (Files.exists(logPath)) {
      val it = Files.readAllLines(logPath, StandardCharsets.UTF_8).iterator()
      while (it.hasNext) { val l = it.next(); if (l.nonEmpty) buf += l }
    }
    buf
  }
  private val admittedSet: mutable.Set[String] = mutable.Set(admitted.toSeq: _*)

  // ---- per-file stability tracking (T2) ------------------------------
  private final case class Stat(size: Long, mtime: Long, var stable: Int)
  private val seen = mutable.Map.empty[String, Stat]

  /** P7-style filename timestamp (the LPI `YYYY-MM-DD_HH-MM-SS`
    * convention), epoch-millis; None → caller falls back to mtime. */
  private def nameTs(name: String): Option[Long] =
    graft.streaming.StabilityGate.DefaultTimestampRe
      .findFirstMatchIn(name).flatMap { m =>
        scala.util.Try(LocalDateTime.parse(
            s"${m.group(1)} ${m.group(2)}",
            java.time.format.DateTimeFormatter.ofPattern(
              graft.streaming.StabilityGate.DefaultTimestampFmt))
          .toInstant(ZoneOffset.UTC).toEpochMilli).toOption
      }

  /** One gate poll: stat every unadmitted `.dat` file, advance
    * stability counts, and append up to `limit` admissible files to the
    * log (oldest first). Synchronized: Spark may race `latestOffset`
    * with nothing else, but cheap insurance against future callers. */
  private def poll(limit: Int): Unit = synchronized {
    val now = clock()
    val listed: Seq[(String, Long, Long)] = paths.flatMap { p =>
      val hp = new HPath(p)
      val fs = hp.getFileSystem(conf)
      val roots = Option(fs.globStatus(hp)).map(_.toSeq)
        .getOrElse(Seq.empty)
      roots.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq.filter(s =>
            s.isFile && s.getPath.getName.toLowerCase.endsWith(".dat"))
        else Seq(st).filter(_.isFile)
      }.map(s => (s.getPath.toString, s.getLen, s.getModificationTime))
    }
    val present = listed.map(_._1).toSet
    seen.filterInPlace { case (f, _) => present.contains(f) }
    val candidates = listed.filterNot { case (f, _, _) => admittedSet(f) }
      .flatMap { case (f, size, mtime) =>
        val st = seen.get(f) match {
          case Some(prev) if prev.size == size && prev.mtime == mtime =>
            prev.stable += 1; prev
          case _ =>
            val fresh = Stat(size, mtime, 1); seen(f) = fresh; fresh
        }
        val old = (now - mtime) >= minFileAgeMs
        if (old && st.stable >= stableChecks) {
          val name = new HPath(f).getName
          Some(((nameTs(name).getOrElse(mtime), name), f))
        } else None
      }
    val take = candidates.sortBy(_._1).map(_._2).take(limit)
    if (take.nonEmpty) {
      // log BEFORE exposing through an offset: a crash between the two
      // re-admits nothing and loses nothing (the offset never existed).
      // SYNC so a committed offset can never reference log entries a
      // crash swallowed — a torn tail would otherwise fail the
      // planInputPartitions range check on restart (loud, but requires
      // checkpoint surgery to recover)
      Files.write(logPath,
        take.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND,
        StandardOpenOption.SYNC)
      admitted ++= take
      admittedSet ++= take
      take.foreach(seen.remove)
    }
  }

  // ---- SupportsAdmissionControl --------------------------------------
  override def getDefaultReadLimit: ReadLimit =
    if (maxFilesPerTrigger > 0) ReadLimit.maxFiles(maxFilesPerTrigger)
    else ReadLimit.allAvailable()

  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val n = limit match {
      case m: ReadMaxFiles => m.maxFiles()
      case _ => Int.MaxValue
    }
    poll(n)
    UdbfOffset(admitted.length.toLong)
  }

  override def reportLatestOffset(): Offset = UdbfOffset(admitted.length.toLong)

  // ---- MicroBatchStream ----------------------------------------------
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "udbf implements SupportsAdmissionControl; Spark calls latestOffset(start, limit)")

  override def initialOffset(): Offset = UdbfOffset(0L)

  override def deserializeOffset(json: String): Offset = {
    val m = """"index"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
    UdbfOffset(m.map(_.group(1).toLong).getOrElse(
      throw new IllegalArgumentException(s"bad udbf offset: $json")))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[UdbfOffset].index.toInt
    val e = end.asInstanceOf[UdbfOffset].index.toInt
    require(s >= 0 && e <= admitted.length && s <= e,
      s"udbf offset range [$s, $e) outside admitted log of ${admitted.length}")
    admitted.slice(s, e).map(f => UdbfInputPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new UdbfReaderFactory(required, chunkFrames, columnar = false)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
