package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Streaming surface at SCALE, measured once per round (round-14
  * verdict item 6): the soak specs pin that state ROWS plateau at the
  * working set; this probe pins the numbers a capacity plan needs —
  * sustained rows/s, state-store BYTES, and batch-duration plateau —
  * by replaying a scaled corpus (default the 10× heaps documents,
  * ~500 k docs) through the two flagship streaming dedup shapes:
  *
  *   A. [[graft.streaming.StreamDedup.againstIndex]] — stream-static
  *      banded join against the PERSISTED minhash signature index of
  *      the same corpus (the t07 index artifact posture: signatures
  *      parquet-round-tripped, then cached). Stateless: the metric is
  *      throughput and per-batch wall, which must NOT trend upward as
  *      batches accumulate.
  *   B. [[graft.streaming.StreamDedup.nearDupWithinWatermark]] —
  *      the stateful admission path. Metrics: state rows AND bytes per
  *      batch (watermark 10 min against a 1 min/batch event clock, so
  *      steady state holds ~10 batches of bucket owners + open
  *      windows), plus the same duration-plateau check.
  *   C/D. [[graft.streaming.WindowedDistinct]] /
  *      [[graft.streaming.WindowedFrequency]] — the streaming sketch
  *      pair, added round 19 (r18 verdict item 5): their bounded-state
  *      contract (HLL ≤ 256 register rows, CMS ≤ 16 384 counter rows
  *      per open window, INDEPENDENT of input cardinality) is spec'd on
  *      toy streams; this pins the measured state plateau and per-batch
  *      wall per corpus decade.
  *
  * Emits one JSON line per phase. Usage:
  *   runMain graft.StreamScaleProbe [sfDir] [nBatches] [phase,phase,…]
  */
object StreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scale10_heaps"))
    val nBatches = if (args.length > 1) args(1).toInt else 20
    val phases: Set[String] =
      if (args.length > 2) args(2).split(",").map(_.trim).toSet
      else Set("against_index", "neardup_within_watermark",
        "windowed_distinct", "windowed_frequency")
    val spark = graft.core.Sessions.local("graft-stream-scale-probe")
    import graft.operators.IncrementalDedup

    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))

    // ---- the persisted index (t07 artifact posture) ----
    val work = Files.createTempDirectory("stream_scale_probe").toString
    val (index, nIndex) = if (phases("against_index")) {
      IncrementalDedup.signatureIndex(docs, "text", "doc_id")
        .write.parquet(s"$work/index.parquet")
      val ix = spark.read.parquet(s"$work/index.parquet").cache()
      (ix, ix.count()) // materialize the cache outside timing
    } else (spark.emptyDataFrame, 0L)

    // ---- source files: one per micro-batch, event clock 1 min/batch ----
    val srcDir = s"$work/src"
    val t0 = java.sql.Timestamp.valueOf("2024-03-15 12:00:00").getTime
    (0 until nBatches).foreach { b =>
      docs.filter(pmod(xxhash64(col("doc_id")), lit(nBatches)) === b)
        .withColumn("ts",
          to_timestamp(lit(new java.sql.Timestamp(t0 + b * 60000L))))
        .coalesce(1).write.parquet(f"$srcDir/batch$b%02d")
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))
    def stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$srcDir/*")

    def f2(d: Double) = math.round(d * 100.0) / 100.0
    def runPhase(name: String,
        out: org.apache.spark.sql.DataFrame,
        ckpt: String): Unit = {
      val w0 = System.nanoTime()
      val q = out.writeStream.format("noop")
        .option("checkpointLocation", ckpt).start()
      q.processAllAvailable()
      val wall = (System.nanoTime() - w0) / 1e9
      val prog = q.recentProgress.toSeq.filter(_.numInputRows > 0)
      q.stop()
      if (prog.isEmpty) {
        // wrong sfDir / empty glob: report a zero-batches run instead of
        // dying on durs.head (r15 advice)
        println(s"""{"metric":"stream_scale_probe","phase":"$name","sf":"$sfDir","index_rows":$nIndex,"batches":0,"rows":0,"wall_s":${f2(wall)},"error":"no batches with input rows — check sfDir/glob"}""")
        return
      }
      val rows = prog.map(_.numInputRows).sum
      val durs = prog.map(_.durationMs.get("triggerExecution").toLong / 1000.0)
      val stRows = prog.map(_.stateOperators.map(_.numRowsTotal).sum)
      val stBytes = prog.map(_.stateOperators.map(_.memoryUsedBytes).sum)
      val line = s"""{"metric":"stream_scale_probe","phase":"$name","sf":"$sfDir","index_rows":$nIndex,"batches":${prog.size},"rows":$rows,"wall_s":${f2(wall)},"rows_per_s":${math.round(rows / wall)},"batch_s_first":${f2(durs.head)},"batch_s_median":${f2(durs.sorted.apply(durs.size / 2))},"batch_s_last":${f2(durs.last)},"state_rows_by_batch":[${stRows.mkString(",")}],"state_bytes_by_batch":[${stBytes.mkString(",")}]}"""
      println(line)
    }

    // A: stateless stream-static join against the persisted index
    if (phases("against_index"))
      runPhase("against_index",
        graft.streaming.StreamDedup.againstIndex(
          stream.select(col("doc_id"), col("text")), "text", "doc_id", index),
        s"$work/ckptA")
    // B: stateful near-dup admission (watermark 10 min, window 1 min)
    if (phases("neardup_within_watermark"))
      runPhase("neardup_within_watermark",
        graft.streaming.StreamDedup.nearDupWithinWatermark(
          stream, "ts", "doc_id", "text"),
        s"$work/ckptB")
    // C/D: the streaming sketch pair over the full text column — the
    // worst-case cardinality (every doc distinct), which is exactly
    // what the sketches bound: 2-minute windows against the 1 min/batch
    // event clock keep ~2 windows open under the 2-minute watermark,
    // so the state plateau is (open windows) × (sketch table size),
    // whatever the corpus decade
    if (phases("windowed_distinct"))
      runPhase("windowed_distinct",
        graft.streaming.WindowedDistinct.tumbling(
          stream, "ts", col("text"),
          windowLength = "2 minutes", watermark = "2 minutes"),
        s"$work/ckptC")
    if (phases("windowed_frequency"))
      runPhase("windowed_frequency",
        graft.streaming.WindowedFrequency.tumbling(
          stream, "ts", col("text"),
          windowLength = "2 minutes", watermark = "2 minutes"),
        s"$work/ckptD")
    spark.stop()
  }
}
