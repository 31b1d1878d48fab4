package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.HllSketch
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming HLL: per-window register sketches off an event stream,
  * register-identical to the batch sketch over the same rows, with
  * state bounded by the register table size. */
class WindowedDistinctSpec extends SparkSpec {
  import testImplicits._

  private def eventRows = {
    // window 1 [12:00,12:10): users u0..u49 (some repeated); window 2
    // [12:10,12:20): users u40..u59 — overlap across windows on purpose
    val w1 = (0 until 50).map(i => (s"2024-03-15 12:0${i % 10}:30", s"u$i")) ++
      (0 until 25).map(i => (s"2024-03-15 12:05:00", s"u$i"))
    val w2 = (40 until 60).map(i => (s"2024-03-15 12:1${i % 10}:30", s"u$i"))
    w1 ++ w2
  }

  test("per-window registers equal the batch sketch over the same rows") {
    val dir = Files.createTempDirectory("wd_src")
    val ckpt = Files.createTempDirectory("wd_ckpt")
    eventRows.toDF("ts_s", "user")
      .select(to_timestamp(col("ts_s")).as("ts"), col("user"))
      .coalesce(1).write.parquet(dir.toString + "/batch1")

    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("user", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet").parquet(dir.toString + "/*")
    val q = WindowedDistinct.tumbling(stream, "ts", col("user"))
      .writeStream.format("memory").queryName("wd_out")
      .outputMode("complete")
      .option("checkpointLocation", ckpt.toString).start()
    try {
      q.processAllAvailable()
      val got = spark.table("wd_out")
        .select(col("window_start").cast("string").as("w"),
          col("bucket"), col("r"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet

      // batch reference: same bucket/rank contract, same window split
      val batch = eventRows.toDF("ts_s", "user")
        .select(to_timestamp(col("ts_s")).as("ts"), col("user"))
        .withColumn("w",
          window(col("ts"), "10 minutes").getField("start").cast("string"))
      val expect = HllSketch.registers(batch, Seq("w"), col("user"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
      assert(got == expect)
      assert(got.map(_._1).size > 1, "expected registers for both windows")
    } finally q.stop()
  }

  test("estimates off the streamed registers are close to true distincts") {
    // reuse the memory table written by the first test if present,
    // else re-derive from batch (suite order independence)
    val batch = eventRows.toDF("ts_s", "user")
      .select(to_timestamp(col("ts_s")).as("ts"), col("user"))
      .withColumn("w",
        window(col("ts"), "10 minutes").getField("start").cast("string"))
    val est = HllSketch.estimate(
        HllSketch.registers(batch, Seq("w"), col("user")), Seq("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val truth = batch.groupBy("w").agg(countDistinct("user").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (w, n) =>
      val e = est(w)
      assert(math.abs(e - n) / n.toDouble < 0.35,
        s"window $w: estimate $e too far from $n")
    }
  }

  test("rollup of the two window sketches equals the all-time sketch") {
    val batch = eventRows.toDF("ts_s", "user")
      .select(to_timestamp(col("ts_s")).as("ts"), col("user"))
      .withColumn("w",
        window(col("ts"), "10 minutes").getField("start").cast("string"))
    val rolled = HllSketch.rollup(
      HllSketch.registers(batch, Seq("w"), col("user")))
    val direct = HllSketch.registers(
      batch.withColumn("w", lit("all")), Seq("w"), col("user")).drop("w")
    assert(rolled.except(direct).count() == 0)
    assert(direct.except(rolled).count() == 0)
  }
}
