package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming materialized view: per-key latest state across
  * micro-batches equals the batch CDC merge over the same changelog;
  * tombstones surface as op='D' rows. */
class StreamMaterializeSpec extends SparkSpec {
  import testImplicits._

  private val schema = StructType(Seq(
    StructField("key", LongType), StructField("seq", LongType),
    StructField("op", StringType), StructField("text", StringType)))

  private def writeBatch(dir: String, n: Int,
                         rows: Seq[(Long, Long, String, String)]): Unit =
    rows.toDF("key", "seq", "op", "text")
      .coalesce(1).write.parquet(s"$dir/batch$n")

  test("latest state across micro-batches equals the batch merge; deletes tombstone") {
    val dir = Files.createTempDirectory("smv_src").toString
    val ckpt = Files.createTempDirectory("smv_ckpt").toString
    writeBatch(dir, 1, Seq(
      (1L, 0L, "U", "one v0"),
      (2L, 0L, "U", "two v0"),
      (3L, 0L, "U", "three v0")))

    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*")
    val q = StreamMaterialize.latest(stream, "key", "seq", "op", "text")
      .writeStream.format("memory").queryName("smv_out")
      .outputMode("complete")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      // later batch: update key 1, delete key 2, stale re-delivery for 3
      writeBatch(dir, 2, Seq(
        (1L, 2L, "U", "one v2"),
        (2L, 1L, "D", null),
        (3L, 0L, "U", "three v0 duplicate-delivery-with-same-seq")))
      q.processAllAvailable()

      val got = spark.table("smv_out")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getString(2), Option(r.getString(3))))).toMap
      assert(got(1L) === ((2L, "U", Some("one v2"))), "newer seq wins")
      assert(got(2L)._1 === 1L)
      assert(got(2L)._2 === "D", "delete surfaces as a tombstone")
      // batch reference: identical max(struct) over the full changelog
      val all = Seq(
        (1L, 0L, "U", "one v0"), (2L, 0L, "U", "two v0"), (3L, 0L, "U", "three v0"),
        (1L, 2L, "U", "one v2"), (2L, 1L, "D", null.asInstanceOf[String]),
        (3L, 0L, "U", "three v0 duplicate-delivery-with-same-seq"))
      val batch = StreamMaterialize.latest(
          all.toDF("key", "seq", "op", "text"), "key", "seq", "op", "text")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getString(2), Option(r.getString(3))))).toMap
      assert(got === batch, "stream state must equal the batch merge")
    } finally q.stop()
  }

  test("latestCompacting: tombstones stay dead within TTL, are forgotten after it") {
    val dir = Files.createTempDirectory("smvc_src").toString
    val ckpt = Files.createTempDirectory("smvc_ckpt").toString
    val tsSchema = StructType(Seq(
      StructField("key", LongType), StructField("seq", LongType),
      StructField("op", StringType), StructField("text", StringType),
      StructField("ts", TimestampType)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s"2024-03-15 $s")
    var batchNo = 0
    def push(rows: Seq[(Long, Long, String, String, java.sql.Timestamp)]): Unit = {
      batchNo += 1
      rows.toDF("key", "seq", "op", "text", "ts")
        .coalesce(1).write.parquet(s"$dir/batch$batchNo")
    }
    push(Seq((1L, 0L, "U", "one v0", ts("10:00:00")),
      (2L, 0L, "U", "two v0", ts("10:00:00"))))

    val stream = spark.readStream.schema(tsSchema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*")
    val out = StreamMaterialize.latestCompacting(stream,
      "key", "seq", "op", "text", "ts", tombstoneTtlMs = 60000L)
    val q = out.toDF().writeStream.format("memory").queryName("smvc_out")
      .outputMode("update")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      def rowsFor(k: Long) = spark.table("smvc_out")
        .filter(col("key") === k)
        .collect().map(r => (r.getLong(1), r.getString(2), Option(r.getString(3))))
      // delete key 2 (seq 10), then a STALE lower-seq redelivery: while
      // the tombstone lives, the key must stay dead
      push(Seq((2L, 10L, "D", null, ts("10:00:30"))))
      q.processAllAvailable()
      push(Seq((2L, 5L, "U", "stale redelivery", ts("10:00:40"))))
      q.processAllAvailable()
      assert(rowsFor(2L).count(_._2 == "D") >= 2,
        "a live tombstone must keep beating stale redeliveries")
      assert(!rowsFor(2L).exists(r => r._2 == "U" && r._1 == 5L),
        "stale redelivery must not resurrect a live tombstone")
      // unrelated traffic advances the watermark past tombstone + TTL
      // (watermark trails one batch: two pushes to cross 10:01:40)
      push(Seq((1L, 1L, "U", "one v1", ts("10:03:00"))))
      q.processAllAvailable()
      push(Seq((1L, 2L, "U", "one v2", ts("10:03:10"))))
      q.processAllAvailable()
      // the tombstone has been compacted away: an older-seq row now
      // recreates the key — the documented TTL trade
      push(Seq((2L, 1L, "U", "resurrected", ts("10:03:20"))))
      q.processAllAvailable()
      assert(rowsFor(2L).contains((1L, "U", Some("resurrected"))),
        s"expired tombstone must be forgotten; got ${rowsFor(2L).toSeq}")
      // live keys never expire
      assert(rowsFor(1L).contains((2L, "U", Some("one v2"))))
    } finally q.stop()
  }
}
