package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** D4 streaming idempotency: duplicate deliveries within the watermark
  * horizon are dropped, first occurrence wins, state is bounded. */
class StreamDedupSpec extends SparkSpec {
  import testImplicits._

  private val schema = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("event_id", LongType),
    StructField("value", DoubleType)))

  private def writeBatch(dir: String, n: Int, rows: Seq[(String, Long, Double)]): Unit =
    rows.toDF("ts_s", "event_id", "value")
      .select(to_timestamp(col("ts_s")).as("ts"), col("event_id"), col("value"))
      .coalesce(1).write.parquet(s"$dir/batch$n")

  test("re-delivered events within the watermark are admitted exactly once") {
    val dir = Files.createTempDirectory("sdd_src").toString
    val ckpt = Files.createTempDirectory("sdd_ckpt").toString
    writeBatch(dir, 1, Seq(
      ("2024-03-15 12:00:00", 1L, 1.0),
      ("2024-03-15 12:00:30", 2L, 2.0),
      ("2024-03-15 12:00:30", 2L, 2.0))) // same-batch duplicate

    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*")
    val deduped = StreamDedup.withinWatermark(stream, "ts", Seq("event_id"))

    val q = deduped.writeStream.format("memory").queryName("sdd_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      // cross-batch re-delivery of event 2 plus a new event 3
      writeBatch(dir, 2, Seq(
        ("2024-03-15 12:01:00", 2L, 2.0),
        ("2024-03-15 12:01:30", 3L, 3.0)))
      q.processAllAvailable()

      val ids = spark.table("sdd_out").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.sameElements(Array(1L, 2L, 3L)),
        s"expected exactly-once ids 1,2,3; got ${ids.mkString(",")}")
      // dedup state holds one row per distinct key seen in the horizon
      assert(q.lastProgress.stateOperators(0).numRowsTotal == 3)
    } finally q.stop()
  }

  private val docSchema = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def writeDocs(dir: String, n: Int, rows: Seq[(String, Long, String)]): Unit =
    rows.toDF("ts_s", "doc_id", "text")
      .select(to_timestamp(col("ts_s")).as("ts"), col("doc_id"), col("text"))
      .coalesce(1).write.parquet(s"$dir/batch$n")

  test("near-duplicates across micro-batches are dropped; distinct docs admitted") {
    val dir = Files.createTempDirectory("sndd_src").toString
    val ckpt = Files.createTempDirectory("sndd_ckpt").toString
    val a = "the quick brown fox jumps over the lazy dog near the riverbank today"
    val b = "completely different content about spark structured streaming state stores and watermarks"
    val c = "a third unrelated document discussing parquet column pruning and predicate pushdown"
    writeDocs(dir, 1, Seq(
      ("2024-03-15 12:00:00", 1L, a),
      ("2024-03-15 12:00:05", 2L, b)))

    val stream = spark.readStream.schema(docSchema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*")
    val admitted = StreamDedup.nearDupWithinWatermark(
      stream, "ts", "doc_id", "text",
      delay = "10 seconds", windowLen = "1 minute")

    val q = admitted.writeStream.format("memory").queryName("sndd_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      // batch 2: near-dup of doc 1 (one appended token — the planted
      // construction every batch detector recovers), plus a fresh doc
      writeDocs(dir, 2, Seq(
        ("2024-03-15 12:00:20", 10L, a + " graftdup"),
        ("2024-03-15 12:00:25", 3L, c)))
      q.processAllAvailable()
      // batch 3: event time far enough ahead to close the 12:00 window
      // (window end 12:01 + 10 s delay)
      writeDocs(dir, 3, Seq(("2024-03-15 12:05:00", 99L, "window flusher")))
      q.processAllAvailable()

      val ids = spark.table("sndd_out").select("doc_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.contains(1L) && ids.contains(2L) && ids.contains(3L),
        s"distinct docs must be admitted; got ${ids.mkString(",")}")
      assert(!ids.contains(10L),
        s"near-dup of an earlier doc must be dropped; got ${ids.mkString(",")}")
    } finally q.stop()
  }

  test("streaming PII redaction: stateless scan-stage transform composes into the stream") {
    // PiiRedact is pure column arithmetic, so it rides the streaming
    // plan unchanged — redaction before admission means PII never
    // reaches dedup state or the sink
    val dir = Files.createTempDirectory("spii_src").toString
    val ckpt = Files.createTempDirectory("spii_ckpt").toString
    writeDocs(dir, 1, Seq(
      ("2024-03-15 12:00:00", 1L, "contact me at alice@example.com or 10.1.2.3"),
      ("2024-03-15 12:00:05", 2L, "nothing sensitive in this one")))

    val stream = spark.readStream.schema(docSchema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*")
    val redacted = graft.operators.PiiRedact.redact(
      stream, idCol = "doc_id", textCol = "text")

    val q = redacted.writeStream.format("memory").queryName("spii_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("spii_out")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(3), r.getString(5))).toMap
      assert(rows(1L) == ((1L, 1L, "contact me at <EMAIL> or <IP>")))
      assert(rows(2L) == ((0L, 0L, "nothing sensitive in this one")))
    } finally q.stop()
  }

  test("streaming curation: scan-stage quality gate composes ahead of near-dup admission") {
    val dir = Files.createTempDirectory("scur_src").toString
    val ckpt = Files.createTempDirectory("scur_ckpt").toString
    val good = "the quick brown fox jumps over the lazy dog near the riverbank today"
    val junk = "alpha beta gamma delta epsilon zeta"  // no stopwords → gated out
    writeDocs(dir, 1, Seq(
      ("2024-03-15 12:00:00", 1L, good),
      ("2024-03-15 12:00:05", 2L, junk)))

    val stream = spark.readStream.schema(docSchema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*")
    // gate BEFORE dedup: junk never reaches (or pollutes) dedup state
    val gated = stream.filter(
      graft.operators.QualityGates.scanKeep(col("text")))
    val admitted = StreamDedup.nearDupWithinWatermark(
      gated, "ts", "doc_id", "text",
      delay = "10 seconds", windowLen = "1 minute")

    val q = admitted.writeStream.format("memory").queryName("scur_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      writeDocs(dir, 2, Seq(
        ("2024-03-15 12:00:20", 10L, good + " graftdup"),  // near-dup → dropped
        ("2024-03-15 12:00:25", 11L, junk + " more")))     // still gated
      q.processAllAvailable()
      // the flusher must itself pass the gate, or event time never
      // advances past the filter and the 12:00 window cannot close
      writeDocs(dir, 3, Seq(
        ("2024-03-15 12:05:00", 99L, "the window flusher document arrives much later in the day")))
      q.processAllAvailable()

      val ids = spark.table("scur_out").select("doc_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.contains(1L), s"good doc must survive; got ${ids.mkString(",")}")
      assert(!ids.contains(2L) && !ids.contains(11L),
        s"gated docs must not be admitted; got ${ids.mkString(",")}")
      assert(!ids.contains(10L),
        s"near-dup must be dropped; got ${ids.mkString(",")}")
    } finally q.stop()
  }

  test("againstIndex: stream flags match the batch incremental dedup, stateless") {
    import graft.operators.IncrementalDedup
    val dir = Files.createTempDirectory("sai_src").toString
    val ckpt = Files.createTempDirectory("sai_ckpt").toString
    val histText = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely different text about distributed query engines and shuffles"),
      (3L, "a third historical document with its own distinctive words inside"))
    val index = IncrementalDedup.signatureIndex(
      histText.toDF("doc_id", "text"), "text", "doc_id").cache()

    val arriving = Seq(
      (10L, histText(0)._2 + " extra"),              // near-dup of 1
      (11L, "totally novel content with zero overlap against the history"),
      (12L, histText(2)._2))                         // exact copy of 3
    arriving.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/batch1")

    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet").parquet(s"$dir/*")
    val q = StreamDedup.againstIndex(stream, "text", "doc_id", index)
      .writeStream.format("memory").queryName("sai_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      // per-band rows collapse to pair decisions downstream — distinct here
      val got = spark.table("sai_out").select("new_id", "old_id")
        .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = IncrementalDedup.newVersusIndex(
          arriving.toDF("doc_id", "text"), "text", "doc_id", index)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === batch, "stream-static flags must equal the batch operator")
      assert(got.contains((10L, 1L)) && got.contains((12L, 3L)))
      assert(!got.exists(_._1 == 11L))
    } finally q.stop()
  }
}
