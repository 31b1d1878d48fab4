package graft.sources.udbf

import java.nio.file.{Files, StandardOpenOption}
import java.time.Instant

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** `readStream.format("udbf")` — the DSv2 streaming source with the T2
  * stability gate as ADMISSION CONTROL (SURVEY §7.4's faithful option;
  * StabilityGate's janitor is the documented fallback). The held-back
  * mid-write assertion is timing-robust by design: admission is
  * once-only, so a file admitted too early would surface as a
  * permanently short row count, not a transient. */
class UdbfStreamSpec extends SparkSpec {
  import UdbfWriter.ChannelSpec

  private val chans = Seq(ChannelSpec("ch_a", "V"))
  private def gen(i: Int, j: Int): Double = i.toDouble
  private def hourMicros(h: Int): Long =
    Instant.parse(f"2024-03-15T$h%02d:00:00Z").toEpochMilli * 1000L

  private def waitUntil(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis + timeoutMs
    while (System.currentTimeMillis < deadline) {
      if (cond) return true
      Thread.sleep(100)
    }
    cond
  }

  test("E2E: a mid-write file is held back (T2) and flows complete once stable") {
    val dir = Files.createTempDirectory("udbf_stream")
    val ckpt = Files.createTempDirectory("udbf_ckpt")
    UdbfWriter.write(dir.resolve("fhe_100hz_2024-03-15_12-00-00.dat"),
      chans, 100, gen, hourMicros(12), 100.0)
    // the complete bytes of file 2, prepared outside the watched dir
    val prep = Files.createTempDirectory("udbf_prep").resolve("full.dat")
    UdbfWriter.write(prep, chans, 50, gen, hourMicros(13), 100.0)
    val bytes = Files.readAllBytes(prep)
    val f2 = dir.resolve("fhe_100hz_2024-03-15_13-00-00.dat")
    Files.write(f2, bytes.take(bytes.length / 2)) // logger mid-write

    // a "logger still writing" thread: grows f2 in small steps, one
    // write every ~60 ms, so its stat never holds still long enough to
    // pass the stability gate while the churn runs
    @volatile var churning = true
    val logger = new Thread(() => {
      var k = 1
      while (churning) {
        val len = math.min(
          bytes.length / 2 + k * (bytes.length / 100), bytes.length - 1)
        Files.write(f2, bytes.take(len), StandardOpenOption.TRUNCATE_EXISTING)
        k += 1
        Thread.sleep(60)
      }
      // the logger finishes: exact final bytes, then left untouched
      Files.write(f2, bytes, StandardOpenOption.TRUNCATE_EXISTING)
    })
    logger.start()

    // stableChecks=5 against a 60 ms churn cadence: the gate needs
    // ~500 ms of stat silence to admit, an 8x margin over the writer
    // thread's step — robust to GC/scheduler stalls on a loaded box
    val q = spark.readStream.format("udbf")
      .option("stableChecks", "5").option("minFileAgeMs", "0")
      .load(dir.toString)
      .writeStream.format("memory").queryName("udbf_mb")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      // the complete file flows while the mid-write one is gated
      assert(waitUntil(60000)(spark.table("udbf_mb").count() == 100L),
        s"complete file did not arrive alone: ${spark.table("udbf_mb").count()} rows")
      // let the gate observe the churn a while longer
      Thread.sleep(1500)
      assert(spark.table("udbf_mb").count() == 100L,
        "mid-write file leaked through the stability gate")
      churning = false
      logger.join(5000)
      // once stable it is admitted ONCE, complete: exactly 50 rows in
      // the 13:00 hour. Any premature admission during the churn above
      // would have frozen a partial decode (< 50 rows) forever — so
      // reaching 150 total proves the gate held.
      assert(waitUntil(60000)(spark.table("udbf_mb").count() == 150L),
        s"gated file never arrived complete: ${spark.table("udbf_mb").count()} rows")
      val byHour = spark.table("udbf_mb")
        .groupBy(hour(col("ts")).as("h")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(byHour === Map(12 -> 100L, 13 -> 50L))
    } finally { churning = false; q.stop() }
  }

  test("E2E: restart resumes from the admitted log exactly-once (D1), oldest first (T3)") {
    val dir = Files.createTempDirectory("udbf_stream2")
    val ckpt = Files.createTempDirectory("udbf_ckpt2")
    val out = Files.createTempDirectory("udbf_out2").resolve("sink").toString
    // two complete files, NEWEST written first — admission must still
    // order by the filename-embedded timestamp
    UdbfWriter.write(dir.resolve("fhe_100hz_2024-03-15_12-00-00.dat"),
      chans, 40, gen, hourMicros(12), 100.0)
    UdbfWriter.write(dir.resolve("fhe_100hz_2024-03-15_11-00-00.dat"),
      chans, 60, gen, hourMicros(11), 100.0)

    def sinkCount(): Long =
      scala.util.Try(spark.read.parquet(out).count()).getOrElse(-1L)

    def run(expect: Long): Unit = {
      val q = spark.readStream.format("udbf")
        .option("stableChecks", "2").option("minFileAgeMs", "0")
        .option("maxFilesPerTrigger", "1")
        .load(dir.toString)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.ProcessingTime("100 milliseconds"))
        .start()
      try assert(waitUntil(60000)(sinkCount() == expect),
        s"expected $expect rows, got ${sinkCount()}")
      finally q.stop()
    }
    run(100L)
    // a third file lands while the query is DOWN; restart picks it up
    // without re-reading the first two
    UdbfWriter.write(dir.resolve("fhe_100hz_2024-03-15_14-00-00.dat"),
      chans, 30, gen, hourMicros(14), 100.0)
    run(130L)
    val got = spark.read.parquet(out)
    assert(got.select(col("ts")).distinct().count() === 130L,
      "duplicate rows after restart — admission log not exactly-once")
    // T3: the persisted admission log orders by filename timestamp even
    // though the 12:00 file hit the disk first
    val log = Files.walk(ckpt).iterator().asScala
      .find(_.getFileName.toString == "udbf-admitted.log")
      .getOrElse(fail("admitted log not found under checkpoint"))
    val names = Files.readAllLines(log).asScala.filter(_.nonEmpty)
      .map(p => p.substring(p.lastIndexOf('/') + 1))
    assert(names.toSeq === Seq(
      "fhe_100hz_2024-03-15_11-00-00.dat",
      "fhe_100hz_2024-03-15_12-00-00.dat",
      "fhe_100hz_2024-03-15_14-00-00.dat"))
  }
}
