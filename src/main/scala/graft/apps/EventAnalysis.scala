package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.ReferenceFunctions.{eventId, isValidMetadataUrl}
import graft.sinks.JsonDocStore

/** The event-ingestion flow — restapi/app_fs.py:101-127 as a Spark
  * batch over a DataFrame of metadata URLs:
  *
  *   F9 URL-shape gate → S7 metadata fetch (pluggable
  *   [[MetadataFetcher]]; runs inside mapPartitions so a real HTTP
  *   client fans out across executors) → from_json with the explicit
  *   metadata schema + required-field validation (data_url,
  *   created_at|creation_timestamp — app_fs.py:91-94) → P13
  *   content-hash event id over the canonical sorted-key payload →
  *   D4 dropDuplicates(event_id) → K6 idempotent atomic JSON store.
  */
object EventAnalysis {

  /** S7 — the fetch boundary. Implementations must be deterministic per
    * URL within a batch (Spark may recompute partitions). */
  trait MetadataFetcher extends Serializable {
    def fetch(url: String): String // raw JSON text (or throws)
  }

  /** Egress-free stand-in for tests/local runs: serves deterministic
    * metadata derived from the URL (a real deployment plugs an HTTP
    * client into the same trait — the container has no network). */
  final class FakeFetcher extends MetadataFetcher {
    override def fetch(url: String): String = {
      val id = url.reverse.takeWhile(_ != '/').reverse
      s"""{"message_type":"crack_report","created_at":"2025-04-22T12:00:00Z",""" +
        s""""data_url":"https://example.invalid/data/$id","version":"1"}"""
    }
  }

  val MetadataSchema: StructType = StructType(Seq(
    StructField("message_type", StringType),
    StructField("created_at", StringType),
    StructField("creation_timestamp", StringType),
    StructField("data_url", StringType),
    StructField("version", StringType)))

  /** Validate + hash + dedup a URL batch. Returns
    * (event_id, metadata_url, metadata struct, valid, reason) — invalid
    * rows carry their 400-style reason instead of being dropped, so a
    * caller can dead-letter them. */
  def ingest(spark: SparkSession, urls: DataFrame, urlCol: String,
      fetcher: MetadataFetcher): DataFrame = {
    import spark.implicits._
    val fetched = urls.select(col(urlCol).as("metadata_url"))
      .as[String]
      .mapPartitions { it =>
        it.map { url =>
          if (!url.matches("(?i)^https?://.*")) (url, null: String)
          else (url, try fetcher.fetch(url) catch { case _: Exception => null })
        }
      }
      .toDF("metadata_url", "raw_json")

    val parsed = fetched
      .withColumn("metadata", from_json(col("raw_json"), MetadataSchema))
      .withColumn("created", coalesce(col("metadata.created_at"),
        col("metadata.creation_timestamp")))
      .withColumn("valid",
        isValidMetadataUrl(col("metadata_url")) &&
          col("raw_json").isNotNull &&
          col("metadata.data_url").isNotNull &&
          col("created").isNotNull)
      .withColumn("reason",
        when(!isValidMetadataUrl(col("metadata_url")),
          "metadata_url must start with http(s)://")
          .when(col("raw_json").isNull, "metadata fetch failed")
          .when(col("metadata.data_url").isNull,
            "Required field 'data_url' is missing in metadata")
          .when(col("created").isNull,
            "Missing timestamp (created_at / creation_timestamp)"))

    // P13 — canonical payload mirrors json.dumps(sort_keys=True) with
    // Python's default ", "/": " separators (app_fs.py:42-51), so ids
    // are byte-compatible with the reference
    def jstr(c: org.apache.spark.sql.Column) =
      when(c.isNull, "null").otherwise(concat(lit("\""), c, lit("\"")))
    val canonical = concat(
      lit("{\"created_at\": "), jstr(col("created")),
      lit(", \"data_url\": "), jstr(col("metadata.data_url")),
      lit(", \"message_type\": "), jstr(col("metadata.message_type")),
      lit(", \"metadata_url\": "), jstr(trim(col("metadata_url"))),
      lit(", \"version\": "), jstr(col("metadata.version")), lit("}"))

    parsed
      .withColumn("event_id", when(col("valid"), eventId(canonical)))
      .dropDuplicates("event_id") // D4 (nulls collapse — invalid rows keep reasons below)
      .select(col("event_id"), col("metadata_url"), col("metadata"),
        col("valid"), col("reason"))
  }

  /** Sink the valid rows into the doc store (K6). Control-plane loop:
    * events are API-scale, not data-scale — and `maxBatch` makes that a
    * CONTRACT, not a comment: the collect goes through
    * [[graft.core.Bounded.collect]], so a caller that points this at a
    * data-scale frame fails loudly (after shipping at most maxBatch + 1
    * rows) instead of materializing it on the driver. Returns ids newly
    * stored. P15 — each record carries a `stored_at` ISO stamp
    * (app_fs.py:36-37, 119); `now` is injectable for deterministic
    * tests. */
  def store(ingested: DataFrame, store: JsonDocStore,
      now: () => java.time.Instant = () => java.time.Instant.now(),
      maxBatch: Int = 10000): Seq[String] =
    graft.core.Bounded.collect(
        ingested.filter(col("valid"))
          .select(col("event_id"), to_json(struct(
            col("event_id"), col("metadata_url"), col("metadata"),
            lit(now().toString).as("stored_at"),
            lit("lpi-event-v1").as("schema"))).as("doc")),
        maxBatch, "EventAnalysis.store")
      .flatMap { r =>
        val id = r.getString(0)
        if (store.store(id, r.getString(1))) Some(id) else None
      }.toSeq
}
