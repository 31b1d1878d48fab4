package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sinks.KvSink

/** S6 — KV-store scan (modbus_writer.py:100-110): snapshot the hashes
  * matching a key pattern into a DataFrame of (key, field, value) rows.
  * The KV store is a small control-plane store (stats hashes expire in
  * 60 s), so the snapshot is driver-side and then parallelized — the
  * relational work (e.g. the J1 register broadcast join) runs
  * distributed on the result. */
object KvScan {

  def scan(spark: SparkSession, kv: KvSink, pattern: String): DataFrame = {
    import spark.implicits._
    kv.scan(pattern)
      .flatMap(k => kv.hgetAll(k).toSeq.sortBy(_._1).map { case (f, v) => (k, f, v) })
      .toDF("key", "field", "value")
  }
}
