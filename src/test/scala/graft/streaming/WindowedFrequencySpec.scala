package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.CmsSketch
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming CMS: per-window counter cells off an event stream,
  * cell-identical to the batch sketch over the same rows. */
class WindowedFrequencySpec extends SparkSpec {
  import testImplicits._

  private def eventRows =
    // window 1: "hot" ×30 + tail; window 2: "hot" ×5 + different tail
    (0 until 30).map(i => (s"2024-03-15 12:0${i % 10}:30", "hot")) ++
      (0 until 20).map(i => (s"2024-03-15 12:05:00", s"w1-$i")) ++
      (0 until 5).map(i => (s"2024-03-15 12:1${i % 10}:30", "hot")) ++
      (0 until 10).map(i => (s"2024-03-15 12:15:00", s"w2-$i"))

  test("per-window cells equal the batch sketch over the same rows") {
    val dir = Files.createTempDirectory("wf_src")
    val ckpt = Files.createTempDirectory("wf_ckpt")
    eventRows.toDF("ts_s", "tok")
      .select(to_timestamp(col("ts_s")).as("ts"), col("tok"))
      .coalesce(1).write.parquet(dir.toString + "/batch1")

    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("tok", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet").parquet(dir.toString + "/*")
    val q = WindowedFrequency.tumbling(stream, "ts", col("tok"))
      .writeStream.format("memory").queryName("wf_out")
      .outputMode("complete")
      .option("checkpointLocation", ckpt.toString).start()
    try {
      q.processAllAvailable()
      val got = spark.table("wf_out")
        .select(col("window_start").cast("string").as("w"),
          col("j"), col("idx"), col("c"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3)))
        .toSet
      val batch = eventRows.toDF("ts_s", "tok")
        .select(to_timestamp(col("ts_s")).as("ts"), col("tok"))
        .withColumn("w",
          window(col("ts"), "10 minutes").getField("start").cast("string"))
      val expect = CmsSketch.sketch(batch, Seq("w"), col("tok"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3)))
        .toSet
      assert(got == expect)
      assert(got.map(_._1).size > 1, "expected cells for both windows")
    } finally q.stop()
  }

  test("point estimates off the per-window sketch bound the true counts") {
    val batch = eventRows.toDF("ts_s", "tok")
      .select(to_timestamp(col("ts_s")).as("ts"), col("tok"))
      .withColumn("w",
        window(col("ts"), "10 minutes").getField("start").cast("string"))
    // window-1 slice: estimate("hot") >= 30 (never under), and equal
    // barring collisions in a 50-value stream (overwhelmingly exact)
    val w1 = batch.where(col("w").contains("12:00:00"))
    val est = CmsSketch.estimate(
        CmsSketch.sketch(w1, Nil, col("tok")),
        Seq("hot").toDF("v"), col("v"))
      .collect().head.getAs[Long]("est")
    assert(est >= 30L && est <= 50L)
  }
}
