package graft.streaming

import java.net.URI
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sinks.KvSink

/** S5 + T1/T7/T9 + K7 — the streaming file pipeline: a Structured
  * Streaming file source over the staging directory (fed by
  * [[StabilityGate]]), one file per micro-batch, per-file try/catch with
  * dead-letter, archive-on-success, and health flags — the Spark shape
  * of conv/scripts/Pipeline.py:162-214.
  *
  *   - Source: `binaryFile` stream projected to `path` only (the binary
  *     content column is pruned away, so listing — not reading — is the
  *     cost). `maxFilesPerTrigger=1` reproduces the single-worker
  *     backpressure (T9, Pipeline.py:60-66); checkpointing makes file
  *     tracking exactly-once across restarts (D1).
  *   - The per-batch `collect()` is control-plane only: it returns at
  *     most `maxFilesPerTrigger` path strings, never data rows.
  *   - Each file runs the supplied `process` (a Spark batch job); an
  *     exception dead-letters the file to `failedDir` and sets
  *     `health:<name>_file_processing=1` (TTL 60), success archives to
  *     `finishedDir` and sets 0 (Pipeline.py:193-204).
  */
final class FilePipeline(
    spark: SparkSession,
    name: String,
    stagingDir: String,
    finishedDir: String,
    failedDir: String,
    checkpointDir: String,
    kv: KvSink,
    process: String => Unit,
    maxFilesPerTrigger: Int = 1,
    pathGlobFilter: String = "*",
    triggerInterval: String = // T1 (TICKER_INTERVAL_SEC)
      s"${graft.core.GraftConfig.tickerIntervalSec} seconds",
    healthTtlSeconds: Long = graft.core.GraftConfig.basicTtlSeconds) { // BASIC_REDIS_TTL

  Files.createDirectories(Paths.get(finishedDir))
  Files.createDirectories(Paths.get(failedDir))

  private val healthKey = s"health:${name}_file_processing"

  private def toLocal(uri: String): Path =
    if (uri.startsWith("file:")) Paths.get(URI.create(uri)) else Paths.get(uri)

  /** Process one admitted file; returns true on success. Public so batch
    * (non-streaming) tests and catch-up runs can reuse the exact
    * dead-letter semantics. */
  def processOne(pathUri: String): Boolean = {
    val p = toLocal(pathUri)
    try {
      process(p.toString)
      Files.move(p, Paths.get(finishedDir).resolve(p.getFileName),
        StandardCopyOption.REPLACE_EXISTING)
      kv.set(healthKey, "0", Some(healthTtlSeconds))
      true
    } catch {
      case e: Exception =>
        try {
          Files.move(p, Paths.get(failedDir).resolve(p.getFileName),
            StandardCopyOption.REPLACE_EXISTING)
          kv.set(healthKey, "1", Some(healthTtlSeconds))
        } catch {
          case _: Exception => () // move failure: leave out of requeue (Pipeline.py:203-204)
        }
        false
    }
  }

  // control-plane collect, contractually ≤ maxFilesPerTrigger path
  // strings per micro-batch (the source's admission bound) — never data
  private[streaming] def handleBatch(batch: DataFrame, batchId: Long): Unit =
    graft.core.Bounded
      .collect(batch.select("path"), maxFilesPerTrigger, "FilePipeline.batch")
      .map(_.getString(0)).sorted.foreach(processOne)

  def start(): StreamingQuery =
    spark.readStream
      .format("binaryFile")
      // binaryFile's fixed schema, required explicitly for streaming;
      // only `path` is ever projected so content is pruned, not read
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
      .option("pathGlobFilter", pathGlobFilter)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(stagingDir)
      .select("path")
      .writeStream
      .queryName(s"graft-pipeline-$name")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .foreachBatch(handleBatch _)
      .start()
}
