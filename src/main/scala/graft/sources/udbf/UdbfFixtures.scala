package graft.sources.udbf

import java.nio.file.{Files, Paths}
import java.time.Instant

/** Deterministic UDBF fixtures for the correctness gate and tests (the
  * environment ships no real logger output, so the golden inputs are
  * generated — same bytes every run, so oracle literals stay valid).
  *
  * 100 Hz fixture: 6000 frames (60 s) starting 2024-03-15T12:00:00Z
  * (an aligned window start: minute % 10 == 0, second == 0 — F2), with
  * value patterns whose exact statistics are closed-form:
  *   ch_a = frame % 10          → mean 4.5,  min 0.0, max 9.0
  *   ch_b = (frame % 4) * 0.5   → mean 0.75, min 0.0, max 1.5
  *   ch_c = 2.5                 → mean 2.5,  min 2.5, max 2.5
  * Units exercise the latin-1 decode path (µm/m, °C —
  * PyQStationConnectWin.py:244-265).
  */
object UdbfFixtures {
  import UdbfWriter.ChannelSpec

  val Channels: Seq[ChannelSpec] = Seq(
    ChannelSpec("ch_a", "µm/m"),
    ChannelSpec("ch_b", "°C"),
    ChannelSpec("ch_c", "V"))

  val Frames = 6000
  val SampleRate = 100.0
  val StartMicros: Long = Instant.parse("2024-03-15T12:00:00Z").toEpochMilli * 1000L

  def valueAt(frame: Int, channel: Int): Double = channel match {
    case 0 => (frame % 10).toDouble
    case 1 => (frame % 4) * 0.5
    case _ => 2.5
  }

  /** Write the fixture file if absent; returns its absolute path. */
  def ensure(dir: String = "/tmp/graft_udbf"): String = {
    val p = Paths.get(dir, "fhe_100hz_2024-03-15_12-00-00.dat")
    if (!Files.exists(p)) {
      UdbfWriter.write(p, Channels, Frames, valueAt, StartMicros, SampleRate)
    }
    p.toAbsolutePath.toString
  }
}
