package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale-soak of the stateful streaming surface: the stream==batch
  * parity specs pin WHAT these operators compute; this suite pins the
  * property that makes them runnable forever — STATE IS BOUNDED BY THE
  * LIVE WORKING SET (live keys / watermark horizon / open windows),
  * never by stream length. Each soak drives an order-of-magnitude more
  * events than the parity specs across many micro-batches and asserts
  * the state-store row counts from the progress telemetry plateau
  * instead of tracking cumulative input. The measured per-batch counts
  * are recorded in PLANS.md ("Streaming state soak" — round 14; the
  * round-13 commit claimed this entry before writing it).
  */
class StreamScaleSoakSpec extends SparkSpec {
  import testImplicits._

  /** Per-batch state rows (summed over stateful operators) after each
    * processAllAvailable — the soak's measurement. */
  private def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.lastProgress.stateOperators.map(_.numRowsTotal).sum

  // ---------------------------------------------------------------
  // latestCompacting: churned keys (create → delete → never again)
  // must NOT accumulate — tombstones expire at TTL; live keys persist.
  // ---------------------------------------------------------------

  private val clSchema = StructType(Seq(
    StructField("key", LongType), StructField("seq", LongType),
    StructField("op", StringType), StructField("text", StringType),
    StructField("ts", TimestampType)))

  test("latestCompacting soak: state tracks live keys + unexpired " +
      "tombstones, not changelog history") {
    val dir = Files.createTempDirectory("soak_cl_src").toString
    val ckpt = Files.createTempDirectory("soak_cl_ckpt").toString
    val liveKeys = 500
    val churnPerBatch = 2000
    val batches = 8
    val t0 = java.sql.Timestamp.valueOf("2024-03-15 12:00:00").getTime

    def writeBatch(b: Int): Unit = {
      val ts = new java.sql.Timestamp(t0 + b * 60000L)
      // live keys: an update each batch; churned keys: create+delete,
      // ids unique per batch so the cumulative churned domain grows
      // linearly while the live set stays fixed
      val live = (0 until liveKeys).map(k =>
        (k.toLong, b.toLong, "U", s"v$b", ts))
      val churn = (0 until churnPerBatch).flatMap { i =>
        val k = 1000000L + b.toLong * churnPerBatch + i
        Seq((k, 0L, "U", "ephemeral", ts), (k, 1L, "D", null, ts))
      }
      (live ++ churn).toDF("key", "seq", "op", "text", "ts")
        .coalesce(1).write.parquet(f"$dir/batch$b%02d")
    }

    // TTL of 90 s against a 60 s batch cadence: a batch's tombstones
    // outlive one successor batch and expire during the next — so the
    // steady state carries at most ~2 batches of tombstones
    val stream = spark.readStream.schema(clSchema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    val q = StreamMaterialize.latestCompacting(stream, "key", "seq", "op",
        "text", "ts", tombstoneTtlMs = 90000L)
      .writeStream.format("memory").queryName("soak_cl_out")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      val trace = (0 until batches).map { b =>
        writeBatch(b); q.processAllAvailable(); stateRows(q)
      }
      info(s"latestCompacting state rows per batch: ${trace.mkString(", ")}")
      val distinctKeysSeen = liveKeys + batches * churnPerBatch // 16 500
      // steady state is live + ≤2 batches' unexpired tombstones, but
      // reaching exactly that depends on the watermark-advancing
      // no-data micro-batch having run before processAllAvailable
      // returns; one extra batch of slack keeps the bound a property
      // of the OPERATOR (state plateaus at O(working set)) instead of
      // of micro-batch scheduling timing (3 batches ≈ 6 500 ≪ 16 500)
      val steadyBound = liveKeys + 3 * churnPerBatch
      assert(trace.last <= steadyBound,
        s"final state ${trace.last} exceeds live-set bound $steadyBound " +
          s"(unbounded would approach $distinctKeysSeen)")
      // plateau, not growth: once expiry kicks in (batch 3+) the curve
      // must be flat — each later batch's state within the same bound
      trace.drop(3).foreach(s => assert(s <= steadyBound,
        s"state $s broke the steady-state bound $steadyBound mid-soak"))
      // and the view itself is still correct: live keys all present at
      // their last seq, expired churned keys absent from the final state
      val got = spark.table("soak_cl_out")
        .groupBy(col("key"))
        .agg(max(struct(col("last_seq"), col("op"), col("value"))).as("m"))
        .where(col("m.op") =!= "D")
      assert(got.count() === liveKeys.toLong)
    } finally q.stop()
  }

  // ---------------------------------------------------------------
  // nearDupWithinWatermark: bucket-ownership + window state must track
  // the watermark horizon, not the cumulative document count.
  // ---------------------------------------------------------------

  private val docSchema = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("nearDupWithinWatermark soak: state tracks the watermark horizon, " +
      "not cumulative documents") {
    val dir = Files.createTempDirectory("soak_nd_src").toString
    val ckpt = Files.createTempDirectory("soak_nd_ckpt").toString
    val docsPerBatch = 1500
    val batches = 6
    val bands = 8
    val t0 = java.sql.Timestamp.valueOf("2024-03-15 12:00:00").getTime

    // deterministic distinct texts (id-derived tokens — no near-dups
    // across docs), plus every 10th doc re-delivered as a near-dup of
    // its predecessor so the dedup path stays exercised under load
    def text(id: Long): String =
      (0 until 24).map(j => s"tok${(id * 31 + j * 7) % 99991}").mkString(" ")
    def writeBatch(b: Int): Unit = {
      val ts = new java.sql.Timestamp(t0 + b * 30000L)
      val rows = (0 until docsPerBatch).map { i =>
        val id = b.toLong * docsPerBatch + i
        val t = if (i % 10 == 9) text(id - 1) + " extra" else text(id)
        (ts, id, t)
      }
      rows.toDF("ts", "doc_id", "text")
        .coalesce(1).write.parquet(f"$dir/batch$b%02d")
    }

    // 30 s batch cadence, 10 s watermark delay, 30 s windows: the
    // horizon holds ~1 batch of buckets and ~1 open window at a time
    val stream = spark.readStream.schema(docSchema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    val q = StreamDedup.nearDupWithinWatermark(stream, "ts", "doc_id",
        "text", delay = "10 seconds", windowLen = "30 seconds",
        numHashes = 32, bands = bands)
      .writeStream.format("memory").queryName("soak_nd_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      val trace = (0 until batches).map { b =>
        writeBatch(b); q.processAllAvailable(); stateRows(q)
      }
      info(s"nearDupWithinWatermark state rows per batch: ${trace.mkString(", ")}")
      // unbounded growth would be bands·(cumulative docs) + window rows
      // ≈ 8 · 9 000 = 72 000+; the horizon holds ≤ 2 batches of bucket
      // ownership plus ≤ 2 open windows of per-doc aggregation rows
      val horizonBound = (2 * docsPerBatch * bands + 2 * docsPerBatch).toLong
      trace.drop(2).foreach(s => assert(s <= horizonBound,
        s"state $s exceeds the horizon bound $horizonBound — growing " +
          "with stream length"))
      // admission semantics under load: windows close as later batches
      // advance the watermark, so earlier batches' decisions are
      // visible; of each planted near-dup pair AT MOST ONE member is
      // admitted (within one micro-batch the bucket-ownership tie can
      // resolve to either member — the contract is one representative
      // per duplicate set, not which one)
      val admittedIds = spark.table("soak_nd_out")
        .collect().map(_.getLong(0)).toSet
      assert(admittedIds.nonEmpty)
      val bothAdmitted = (0 until batches).flatMap(b => (0 until docsPerBatch)
        .filter(_ % 10 == 9).map(i => b.toLong * docsPerBatch + i))
        .count(dup => admittedIds.contains(dup) && admittedIds.contains(dup - 1))
      assert(bothAdmitted === 0,
        s"$bothAdmitted near-dup pairs had BOTH members admitted")
    } finally q.stop()
  }
}
