package graft.streaming

import java.nio.file.{Files, Path, Paths}

import graft.SparkSpec
import graft.apps.{LpiAnalysis, SensAnalysis}
import graft.sinks.InMemoryKvSink
import graft.sources.udbf.UdbfWriter
import graft.sources.udbf.UdbfWriter.ChannelSpec

/** S5/T2/T3/T7/K7 — stability admission, oldest-first ordering,
  * dead-letter, and the end-to-end LPI spine (Pipeline.py semantics). */
class StreamingSpec extends SparkSpec {

  private def tmp(prefix: String): Path = Files.createTempDirectory(prefix)

  /** Gate with a controllable clock, starting at the real now. */
  private def gateWith(input: Path, staging: Path): (StabilityGate, () => Unit) = {
    var offset = 0L
    val gate = new StabilityGate(input, staging,
      clock = () => System.currentTimeMillis + offset)
    (gate, () => offset += 41000L)
  }

  test("T2: an in-flight file is refused until stable and aged") {
    val input = tmp("gate_in"); val staging = tmp("gate_stage")
    val (gate, age) = gateWith(input, staging)
    val f = input.resolve("a_100hz_2024-03-15_12-00-00.dat")
    Files.write(f, Array[Byte](1, 2, 3))
    // young file: never admitted regardless of stability count
    assert(gate.poll().isEmpty)
    assert(gate.poll().isEmpty)
    assert(gate.poll().isEmpty)
    // age passes: enough consecutive identical stats were seen
    age()
    assert(gate.poll().contains(staging.resolve(f.getFileName)))
    assert(!Files.exists(f))
  }

  test("T2: modification resets the stability count") {
    val input = tmp("gate_in2"); val staging = tmp("gate_stage2")
    var offset = 0L
    val gate = new StabilityGate(input, staging, stableChecks = 2,
      clock = () => System.currentTimeMillis + offset)
    val f = input.resolve("b_100hz_2024-03-15_12-00-00.dat")
    Files.write(f, Array[Byte](1))
    offset += 41000L
    assert(gate.poll().isEmpty) // first aged observation: count 1 < 2
    // writer appends → size/mtime change → count must reset
    Files.write(f, Array[Byte](1, 2, 3, 4))
    Files.setLastModifiedTime(f,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis + 1000))
    offset += 41000L
    assert(gate.poll().isEmpty) // fresh stat observed once
    assert(gate.poll().isDefined) // second identical observation: admitted
  }

  test("T3: stable candidates are admitted oldest-filename-timestamp first") {
    val input = tmp("gate_in3"); val staging = tmp("gate_stage3")
    val (gate, age) = gateWith(input, staging)
    Seq("c_2024-03-15_12-20-00.dat", "a_2024-03-15_12-00-00.dat",
      "b_2024-03-15_12-10-00.dat").foreach { n =>
      Files.write(input.resolve(n), Array[Byte](1))
    }
    gate.poll(); age() // build stability counts, then age past the gate
    val admitted = gate.pollAll().map(_.getFileName.toString)
    assert(admitted == Seq("a_2024-03-15_12-00-00.dat",
      "b_2024-03-15_12-10-00.dat", "c_2024-03-15_12-20-00.dat"))
  }

  test("T3: unparsable filename falls back to mtime ordering") {
    val input = tmp("gate_in4"); val staging = tmp("gate_stage4")
    val (gate, age) = gateWith(input, staging)
    val young = input.resolve("no-timestamp-young.bin")
    val old = input.resolve("no-timestamp-old.bin")
    Files.write(young, Array[Byte](1)); Files.write(old, Array[Byte](2))
    Files.setLastModifiedTime(old,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis - 500000))
    gate.poll(); age()
    val admitted = gate.pollAll().map(_.getFileName.toString)
    assert(admitted == Seq("no-timestamp-old.bin", "no-timestamp-young.bin"))
  }

  test("T7: processOne archives on success, dead-letters on failure, sets health") {
    val staging = tmp("pl_stage"); val finished = tmp("pl_fin")
    val failed = tmp("pl_fail"); val ckpt = tmp("pl_ckpt")
    val kv = new InMemoryKvSink()
    val pipeline = new FilePipeline(spark, "t7", staging.toString,
      finished.toString, failed.toString, ckpt.toString, kv,
      process = p => require(!p.contains("bad"), "boom"))
    val good = staging.resolve("good.dat"); val bad = staging.resolve("bad.dat")
    Files.write(good, Array[Byte](1)); Files.write(bad, Array[Byte](2))
    assert(pipeline.processOne(good.toString))
    assert(kv.get("health:t7_file_processing").contains("0"))
    assert(Files.exists(finished.resolve("good.dat")))
    assert(!pipeline.processOne(bad.toString))
    assert(kv.get("health:t7_file_processing").contains("1"))
    assert(Files.exists(failed.resolve("bad.dat")))
    assert(!Files.exists(bad))
  }

  test("E2E: gate → stream → udbf decode → stats CSV + KV → archive; corrupt file dead-letters") {
    val input = tmp("e2e_in"); val staging = tmp("e2e_stage")
    val finished = tmp("e2e_fin"); val failed = tmp("e2e_fail")
    val stats = tmp("e2e_stats"); val ckpt = tmp("e2e_ckpt")

    val chans = Seq(ChannelSpec("ch_a", "µm/m"), ChannelSpec("ch_b", "°C"),
      ChannelSpec("ch_c", "V"))
    def vals(i: Int, j: Int): Double = j match {
      case 0 => (i % 10).toDouble
      case 1 => (i % 4) * 0.5
      case _ => 2.5
    }
    // aligned file: full stats; cut file: first 10 s are warm-up zeros
    // that the F4 trim must remove (ch_a then reads 5.0 flat)
    val alignedName = "fhe_100hz_2024-03-15_12-00-00.dat"
    val cutName = "fhe_100hz_2024-03-15_12-03-27.dat"
    UdbfWriter.write(input.resolve(alignedName), chans, 6000, vals,
      1710504000000000L, 100.0)
    UdbfWriter.write(input.resolve(cutName), Seq(ChannelSpec("ch_a", "V")), 6000,
      (i, _) => if (i < 1000) 0.0 else 5.0, 1710504207000000L, 100.0)
    Files.write(input.resolve("corrupt_100hz_2024-03-15_12-10-00.dat"),
      "this is not a udbf file".getBytes)

    val alignedBytes = Files.size(input.resolve(alignedName))
    val kv = new InMemoryKvSink()
    val analysis = new LpiAnalysis(spark, stats.toString, kv,
      refSizesKb = Map("100hz" -> alignedBytes / 1000.0))

    // T2/T3: admit all three (aged clock), oldest first
    var offset = 0L
    val gate = new StabilityGate(input, staging,
      clock = () => System.currentTimeMillis + offset)
    gate.poll(); offset += 41000L
    assert(gate.pollAll().size == 3)

    val pipeline = new FilePipeline(spark, "lpi_100hz", staging.toString,
      finished.toString, failed.toString, ckpt.toString, kv,
      process = analysis.processFile, pathGlobFilter = "*.dat")
    val query = pipeline.start()
    try query.processAllAvailable() finally query.stop()

    // K7: archive vs dead-letter
    assert(Files.exists(finished.resolve(alignedName)))
    assert(Files.exists(finished.resolve(cutName)))
    assert(Files.exists(failed.resolve("corrupt_100hz_2024-03-15_12-10-00.dat")))
    // health flag set by the last processed file (batch order among
    // same-mtime files is not deterministic; per-file semantics are
    // covered by the T7 test)
    assert(kv.get("health:lpi_100hz_file_processing").isDefined)

    // K1: reference CSV format, byte-exact
    val csv = Files.readString(stats.resolve("fhe_100hz_2024-03-15_12-00-00_stats.csv"))
    assert(csv ==
      """Sensor,Mean,Minimum,Maximum
        |ch_a,4.5,0.0,9.0
        |ch_b,0.75,0.0,1.5
        |ch_c,2.5,2.5,2.5
        |""".stripMargin)

    // F4: the cut file's warm-up zeros are trimmed
    val cutCsv = Files.readString(stats.resolve("fhe_100hz_2024-03-15_12-03-27_stats.csv"))
    assert(cutCsv ==
      """Sensor,Mean,Minimum,Maximum
        |ch_a,5.0,5.0,5.0
        |""".stripMargin)

    // K3: stats hash with TTL, F3 size health was written. The VALUE is
    // last-processed-file state: the corrupt file's aligned name gets a
    // size verdict (1 — 23 bytes) before its decode throws, so "0" vs
    // "1" depends on batch order among same-mtime files (the same
    // nondeterminism the processing flag above documents). Per-file
    // band semantics are pinned by the r10 oracle + AppsSpec.
    val hash = kv.hgetAll("stats:fhe_100hz_2024-03-15_12-00-00")
    assert(hash("ch_a:mean") == "4.5" && hash("ch_b:max") == "1.5"
      && hash("ch_c:min") == "2.5")
    assert(Set("0", "1").contains(
      kv.get("health:lpi_100hz_file_size").getOrElse("missing")))

    // D1: a restart from the same checkpoint must not reprocess
    val csvMtime = Files.getLastModifiedTime(
      stats.resolve("fhe_100hz_2024-03-15_12-00-00_stats.csv"))
    val query2 = pipeline.start()
    try query2.processAllAvailable() finally query2.stop()
    assert(Files.getLastModifiedTime(
      stats.resolve("fhe_100hz_2024-03-15_12-00-00_stats.csv")) == csvMtime)
  }

  test("E2E: the SENS flow runs under the same streaming driver") {
    val staging = tmp("sens_stage"); val finished = tmp("sens_fin")
    val failed = tmp("sens_fail"); val ckpt = tmp("sens_ckpt")
    Files.writeString(staging.resolve("probe_2024-03-15_12-00-00.csv"),
      "stamp,reading\n2024-03-15 11:00:00,1.5\n2024-03-15 12:00:00,2.5\n")
    val kv = new InMemoryKvSink()
    val sens = new SensAnalysis(spark, kv)
    val pipeline = new FilePipeline(spark, "sens", staging.toString,
      finished.toString, failed.toString, ckpt.toString, kv,
      process = sens.processFile, pathGlobFilter = "*.csv")
    val q = pipeline.start()
    try q.processAllAvailable() finally q.stop()
    assert(Files.exists(finished.resolve("probe_2024-03-15_12-00-00.csv")))
    val hash = kv.hgetAll("stats:probe_2024-03-15_12-00-00")
    assert(hash("probe_2024-03-15_12-00-00_reading") == "2.5")
    assert(kv.get("health:sens_file_processing").contains("0"))
  }
}
