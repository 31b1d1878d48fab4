package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-frontier politeness scheduling: the stage between URL dedup
  * (t53) / domain admission (t55) and the fetcher. A crawler must not
  * hit one host concurrently, so the frontier is consumed one URL per
  * host per scheduling slot; within a host, higher-priority URLs go
  * first. `slot` is therefore exactly the URL's priority rank within
  * its host — the Mercator-style per-host FIFO flattened into a
  * deterministic column (Heydon & Najork, WWW 1999, describe the
  * per-host queue structure; the rank formulation is its closed
  * form) — and an optional per-host budget drops everything ranked
  * past the cap.
  *
  * Scale shape: ONE exchange, the host hash partition for the rank
  * window (the t33 source-cap shape). No global ordering anywhere —
  * the fetcher consumes (slot, host) groups; a million-URL host
  * bounds its own partition, never the job. */
object Frontier {

  /** Adds `host` and `slot` (1-based per-host priority rank, BIGINT);
    * drops URLs ranked past `maxPerHost` when a budget is given.
    * `tieCols` must make the within-host order total — determinism is
    * the caller's contract, same as every ranked operator here. */
  def schedule(df: DataFrame, urlCol: String, priorityCol: String,
               tieCols: Seq[String], maxPerHost: Option[Int] = None): DataFrame = {
    require(tieCols.nonEmpty, "frontier: need tie-break columns for a total order")
    val w = Window.partitionBy(col("host"))
      .orderBy(col(priorityCol).desc +: tieCols.map(col(_).asc): _*)
    val ranked = df
      .withColumn("host", UrlDedup.host(col(urlCol)))
      .withColumn("slot", row_number().over(w).cast("long"))
    maxPerHost.fold(ranked)(cap => ranked.filter(col("slot") <= cap))
  }
}
