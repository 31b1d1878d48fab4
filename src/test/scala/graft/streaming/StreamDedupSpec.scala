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
}
