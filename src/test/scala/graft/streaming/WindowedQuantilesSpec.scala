package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.QuantileSketch
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming quantile sketch: per-window bucket tables off an event
  * stream, bucket-identical to the batch sketch, with quantile
  * readouts off the emitted sketch. */
class WindowedQuantilesSpec extends SparkSpec {
  import testImplicits._

  private def eventRows =
    // window 1: latencies 1..100; window 2: 1000..1090 (shifted scale)
    (1 to 100).map(i => (s"2024-03-15 12:0${i % 10}:30", i.toLong)) ++
      (0 until 91).map(i => (s"2024-03-15 12:1${i % 10}:30", 1000L + i))

  test("per-window buckets equal the batch sketch over the same rows") {
    val dir = Files.createTempDirectory("wq_src")
    val ckpt = Files.createTempDirectory("wq_ckpt")
    eventRows.toDF("ts_s", "v")
      .select(to_timestamp(col("ts_s")).as("ts"), col("v"))
      .coalesce(1).write.parquet(dir.toString + "/batch1")

    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("v", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet").parquet(dir.toString + "/*")
    val q = WindowedQuantiles.tumbling(stream, "ts", col("v"))
      .writeStream.format("memory").queryName("wq_out")
      .outputMode("complete")
      .option("checkpointLocation", ckpt.toString).start()
    try {
      q.processAllAvailable()
      val got = spark.table("wq_out")
        .select(col("window_start").cast("string").as("w"),
          col("bucket"), col("c"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
        .toSet
      val batch = eventRows.toDF("ts_s", "v")
        .select(to_timestamp(col("ts_s")).as("ts"), col("v"))
        .withColumn("w",
          window(col("ts"), "10 minutes").getField("start").cast("string"))
      val expect = QuantileSketch.sketch(batch, Seq("w"), col("v"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
        .toSet
      assert(got == expect)
      assert(got.map(_._1).size > 1, "expected buckets for both windows")
    } finally q.stop()
  }

  test("quantile readout off the per-window sketch respects the 1/16 bound") {
    val batch = eventRows.toDF("ts_s", "v")
      .select(to_timestamp(col("ts_s")).as("ts"), col("v"))
      .withColumn("w",
        window(col("ts"), "10 minutes").getField("start").cast("string"))
    val sk = QuantileSketch.sketch(batch, Seq("w"), col("v"))
    val est = QuantileSketch.quantiles(sk, Seq("w"), Seq(50, 99))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // window 2 true p50 over 1000..1090 is 1045: estimate within 1/16 below
    val w2 = est.collect { case ((w, 50), e) if w.contains("12:10:00") => e }
    assert(w2.nonEmpty)
    assert(w2.head <= 1045 && w2.head >= (1045 * 15) / 16)
  }
}
