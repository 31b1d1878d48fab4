package graft.apps

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.sinks.{InMemoryKvSink, JsonDocStore}
import graft.sources.KvScan
import org.apache.spark.sql.functions._

/** The SENS / MIST / Event app flows plus the S6 KV scan. */
class AppsSpec extends SparkSpec {
  import testImplicits._

  test("SENS: parquet latest-row by first-column timestamp → KV pairs") {
    val dir = Files.createTempDirectory("sens")
    val f = dir.resolve("sens_2024-03-15_12-00-00.parquet").toString
    Seq(
      ("2024-03-15 11:00:00", 1.5, "a"),
      ("2024-03-15 12:00:00", 2.5, "b"), // latest
      ("2024-03-15 10:00:00", 3.5, "c"))
      .toDF("ts_text", "reading", "label")
      .coalesce(1).write.parquet(f)
    val kv = new InMemoryKvSink()
    // spark wrote a directory named *.parquet; the scan reads it whole
    new SensAnalysis(spark, kv).processFile(f)
    val stem = "sens_2024-03-15_12-00-00"
    val hash = kv.hgetAll(s"stats:$stem")
    assert(hash(s"${stem}_reading") == "2.5")
    assert(hash(s"${stem}_label") == "b")
    assert(hash(s"${stem}_timestamp").startsWith("2024-03-15T12:00:00"))
  }

  test("SENS: no parsable timestamps falls back to physical last row; null → empty") {
    val dir = Files.createTempDirectory("sens2")
    val f = dir.resolve("plain.csv")
    Files.writeString(f, "name,score\nx,1\ny,\nz,3\n")
    val kv = new InMemoryKvSink()
    new SensAnalysis(spark, kv).processFile(f.toString)
    val hash = kv.hgetAll("stats:plain")
    assert(hash("plain_name") == "z")
    assert(hash("plain_score") == "3")
    assert(!hash.contains("plain_timestamp"))
  }

  test("SENS: empty file and bad suffix fail like the reference") {
    val dir = Files.createTempDirectory("sens3")
    val empty = dir.resolve("empty.csv")
    Files.writeString(empty, "a,b\n")
    val kv = new InMemoryKvSink()
    val sens = new SensAnalysis(spark, kv)
    assert(intercept[IllegalArgumentException](
      sens.processFile(empty.toString)).getMessage.contains("no rows"))
    intercept[IllegalArgumentException](sens.processFile("/tmp/x.dat"))
  }

  test("MIST: CSV numeric channels → stats CSV + KV (real pipeline, not the stub)") {
    val dir = Files.createTempDirectory("mist")
    val stats = Files.createTempDirectory("mist_stats")
    val f = dir.resolve("ae_2024-03-15_12-00-00.csv")
    Files.writeString(f,
      "sensor_name,amplitude,counts\nA,10.0,5\nA,20.0,7\nB,30.0,9\n")
    val kv = new InMemoryKvSink()
    new MistAnalysis(spark, stats.toString, kv).processFile(f.toString)
    val csv = Files.readString(stats.resolve("ae_2024-03-15_12-00-00_stats.csv"))
    assert(csv ==
      """Sensor,Mean,Minimum,Maximum
        |amplitude,20.0,10.0,30.0
        |counts,7.0,5.0,9.0
        |""".stripMargin)
    assert(kv.hget("stats:ae_2024-03-15_12-00-00", "amplitude:mean").contains("20.0"))
  }

  test("Event: gate → fetch → validate → hash → dedup → idempotent store") {
    val store = new JsonDocStore(Files.createTempDirectory("events"))
    val urls = Seq(
      "https://meta.example/42",
      "https://meta.example/42", // duplicate URL → same event id
      "HTTP://meta.example/43",
      "ftp://bad.example/44",    // F9 reject
      "not a url").toDF("url")
    val out = EventAnalysis.ingest(spark, urls, "url", new EventAnalysis.FakeFetcher())
    val rows = out.collect()
    assert(rows.count(_.getBoolean(3)) == 2) // two valid distinct events
    val invalid = rows.filter(r => !r.getBoolean(3))
    assert(invalid.forall(_.getString(4) != null)) // carries 400-style reason
    val fixedNow = java.time.Instant.parse("2025-04-22T12:00:00Z")
    val storedIds = EventAnalysis.store(out, store, now = () => fixedNow)
    assert(storedIds.length == 2)
    // P15 — stored_at stamp in every stored record
    assert(store.get(storedIds.head).get.contains("\"stored_at\":\"2025-04-22T12:00:00Z\""))
    // idempotent: a second batch stores nothing new
    assert(EventAnalysis.store(out, store).isEmpty)
    assert(store.ids().length == 2)
    storedIds.foreach(id => assert(id.matches("[0-9a-f]{16}")))
  }

  test("Event: store enforces its per-batch cardinality contract (Bounded)") {
    val store = new JsonDocStore(Files.createTempDirectory("events-bounded"))
    val urls = (1 to 5).map(i => s"https://meta.example/$i").toDF("url")
    val out = EventAnalysis.ingest(spark, urls, "url", new EventAnalysis.FakeFetcher())
    val ex = intercept[IllegalStateException] {
      EventAnalysis.store(out, store, maxBatch = 3)
    }
    assert(ex.getMessage.contains("EventAnalysis.store"))
    assert(store.ids().isEmpty, "a violating batch must store nothing")
  }

  test("Event: missing required metadata fields are rejected with reasons") {
    val noDataUrl = new EventAnalysis.MetadataFetcher {
      override def fetch(url: String): String =
        """{"message_type":"x","created_at":"2025-01-01"}"""
    }
    val out = EventAnalysis.ingest(spark,
      Seq("https://meta.example/1").toDF("url"), "url", noDataUrl).collect()
    assert(!out.head.getBoolean(3))
    assert(out.head.getString(4).contains("data_url"))
  }

  test("S6: KvScan snapshots matching hashes as (key, field, value) rows") {
    val kv = new InMemoryKvSink()
    kv.hset("stats:f1", Map("a:mean" -> "1.0", "a:max" -> "2.0"), None)
    kv.hset("stats:f2", Map("b:mean" -> "3.0"), None)
    kv.set("health:x", "0", None)
    val df = KvScan.scan(spark, kv, "stats:*")
    assert(df.count() == 3)
    assert(df.filter(col("key") === "stats:f1").count() == 2)
    // joins work downstream (J1 shape)
    val mapping = Seq(("a:mean", 100)).toDF("field", "register")
    assert(df.join(broadcast(mapping), Seq("field")).count() == 1)
  }
}
