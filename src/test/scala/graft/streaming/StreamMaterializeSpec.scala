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
}
