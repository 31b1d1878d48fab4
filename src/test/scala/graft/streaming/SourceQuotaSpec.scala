package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** transformWithState per-source quota: first-N admission across
  * micro-batches, per-key isolation, bounded state, TTL budget reset. */
class SourceQuotaSpec extends SparkSpec {
  import testImplicits._

  private val schema = StructType(Seq(
    StructField("source", StringType),
    StructField("doc_id", LongType)))

  private def writeBatch(dir: String, n: Int, rows: Seq[(String, Long)]): Unit =
    rows.toDF("source", "doc_id").coalesce(1).write.parquet(s"$dir/batch$n")

  /** transformWithState requires the RocksDB provider. Local-FS RocksDB
    * snapshots fork a shell per file (Hadoop RawLocalFileSystem), so keep
    * the state partition count tiny and use changelog checkpointing —
    * otherwise a 32-partition snapshot per micro-batch takes minutes. */
  private def withRocksDb[T](body: => T): T = {
    val opts = Seq(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
        "true",
      "spark.sql.shuffle.partitions" -> "2")
    val prev = opts.map { case (k, _) => k -> spark.conf.getOption(k) }
    opts.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach { case (k, p) =>
      p.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("admits at most N per source across micro-batches; other keys unaffected") {
    withRocksDb {
      val dir = Files.createTempDirectory("sq_src").toString
      val ckpt = Files.createTempDirectory("sq_ckpt").toString
      writeBatch(dir, 1, Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 10L)))

      val stream = spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$dir/*")
      val admitted = SourceQuota.admit(stream, "source", "doc_id", maxPerKey = 2)
        .toDF("source", "doc_id")

      val q = admitted.writeStream.format("memory").queryName("sq_out")
        .outputMode("append").option("checkpointLocation", ckpt).start()
      try {
        q.processAllAvailable()
        // batch 2: a is over quota, b has budget left
        writeBatch(dir, 2, Seq(("a", 4L), ("b", 11L), ("b", 12L)))
        q.processAllAvailable()

        val out = spark.table("sq_out").collect()
          .map(r => r.getString(0) -> r.getLong(1)).toSet
        val aIds = out.filter(_._1 == "a").map(_._2)
        val bIds = out.filter(_._1 == "b").map(_._2)
        assert(aIds.size === 2 && aIds.subsetOf(Set(1L, 2L, 3L)),
          s"source a must admit exactly 2 of batch 1, got $aIds")
        assert(bIds === Set(10L, 11L), s"source b admits first 2 seen, got $bIds")
        // state: ONE counter row per distinct key, not per row
        assert(q.lastProgress.stateOperators(0).numRowsTotal === 2)
      } finally q.stop()
    }
  }

  test("TTL resets a key's budget after inactivity") {
    withRocksDb {
      val dir = Files.createTempDirectory("sqt_src").toString
      val ckpt = Files.createTempDirectory("sqt_ckpt").toString
      writeBatch(dir, 1, Seq(("a", 1L), ("a", 2L)))

      val stream = spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$dir/*")
      val admitted = SourceQuota.admit(stream, "source", "doc_id",
          maxPerKey = 1, ttl = Some(java.time.Duration.ofSeconds(1)))
        .toDF("source", "doc_id")

      // ProcessingTime mode schedules batches continuously (that is what
      // advances TTL), so processAllAvailable never settles — poll the
      // sink instead
      def awaitRows(n: Long, timeoutMs: Long = 120000): Unit = {
        val deadline = System.currentTimeMillis + timeoutMs
        while (spark.table("sqt_out").count() < n) {
          assert(System.currentTimeMillis < deadline,
            s"sink did not reach $n rows in ${timeoutMs}ms")
          Thread.sleep(250)
        }
      }
      val q = admitted.writeStream.format("memory").queryName("sqt_out")
        .outputMode("append").option("checkpointLocation", ckpt).start()
      try {
        awaitRows(1)
        Thread.sleep(3000)  // let the 1s TTL lapse
        assert(spark.table("sqt_out").count() === 1, "quota 1: only doc 1")
        writeBatch(dir, 2, Seq(("a", 3L)))
        awaitRows(2)
        val ids = spark.table("sqt_out").select("doc_id")
          .collect().map(_.getLong(0)).toSet
        assert(ids === Set(1L, 3L),
          s"budget must reset after TTL expiry, got $ids")
      } finally q.stop()
    }
  }
}
