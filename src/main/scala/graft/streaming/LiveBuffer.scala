package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S8 — the live Q.station buffer connection, as a STREAM SHAPE (the
  * reference's online/buffered controller connection is hardware-bound
  * and unused by its own pipelines — PyQStationConnectWin.py:93-142,
  * 327-345; SURVEY marks it out of scope for v1, shape = rate-limited
  * receiver). This module provides that shape on Spark's rate source:
  * a frames-per-second-limited unbounded stream with the decoder's
  * output schema (ts + one DOUBLE per channel), so everything
  * downstream of a real receiver — WindowedStats, KvStatsSink,
  * PartnerJoin — is exercisable end to end today, and a hardware
  * receiver only has to reproduce this schema.
  *
  * `backtimeSeconds` mirrors SetBackTime (PyQStationConnectWin.py:
  * 110-114): the stream starts `backtime` behind now, replaying the
  * circular buffer's tail first. Channel values are a deterministic
  * function of (frame, channel) — the synthetic stand-in for live
  * measurements. */
object LiveBuffer {

  def stream(
      spark: SparkSession,
      channels: Seq[String],
      sampleRate: Int,
      backtimeSeconds: Long = 0L): DataFrame = {
    val base = spark.readStream
      .format("rate")
      .option("rowsPerSecond", sampleRate.toLong)
      .load() // (timestamp, value)
    val shifted = base.select(
      (col("timestamp") - expr(s"INTERVAL $backtimeSeconds SECONDS")).as("ts"),
      col("value").as("__frame"))
    channels.zipWithIndex.foldLeft(shifted) { case (df, (name, i)) =>
      // deterministic per-(frame, channel) synthetic signal
      df.withColumn(name,
        sin(col("__frame") / lit(10.0 + i)) * lit(i + 1.0))
    }.drop("__frame")
  }
}
