package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-exact dedup — the standard crawl-curation
  * PRE-pass every large-scale pipeline runs before content dedup (the
  * reference's data plane has no URLs — F9 gates their shape only — so
  * this is extension surface, like the rest of the LLM-pipeline
  * family).
  *
  * Canonicalization rules (RFC 3986 normalization plus the tracking
  * strip; each mirrored verbatim by the t53 oracle SQL and pinned by
  * the UrlDedupSpec truth table):
  *   1. scheme and host lowercase;
  *   2. default port stripped (:80 for http, :443 for https; the
  *      comparison is on the zero-stripped digit string, so ':0080'
  *      drops too and overflowing ports never mis-classify; other
  *      ports are kept verbatim);
  *   3. fragment dropped;
  *   4. `utm_*` query parameters removed (case-sensitive prefix, the
  *      conventional spelling); an emptied query drops its '?'; other
  *      parameters keep their original order;
  *   5. trailing '/' runs stripped from the path; an empty path
  *      becomes '/'.
  *
  * Everything is built from codegen'd string/regex/array built-ins — no
  * UDF — so canonicalization runs in the scan stage with zero shuffle.
  * [[resolve]] then shuffles (id, canon_url) ONCE on the canonical key
  * for the min-id group aggregate, and the join back reuses that same
  * key — the t06 exact-dedup contract applied to URLs. */
object UrlDedup {

  private val SchemeHostRe = "^(?i)(https?)://([^/:?#]+)"

  /** Strict whole-URL shape: scheme://host, optional :digits port,
    * optional /path (no '?'/'#' inside), optional ?query (no '#'),
    * optional #fragment — and NOTHING else. A URL failing this (e.g. a
    * non-numeric port 'http://a.com:abc/x') must canonicalize to
    * ITSELF, never to a cleaned-up lookalike: silently dropping the
    * malformed port would CONFLATE it with 'http://a.com/x'. */
  private val StrictUrlRe =
    "^(?i)https?://[^/:?#]+(:[0-9]+)?(/[^?#]*)?(\\?[^#]*)?(#.*)?$"

  /** The canonical form of an http(s) URL per the rules above. A value
    * that does not FULLY parse as http(s)://host[:port][/path][?q][#f]
    * canonicalizes to itself, i.e. garbage stays unique — a dedup pass
    * must never CONFLATE unparseable keys. */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, SchemeHostRe, 1))
    val host = lower(regexp_extract(url, SchemeHostRe, 2))
    val port = regexp_extract(url, "^(?i)https?://[^/:?#]+:(\\d+)", 1)
    val rawPath = regexp_extract(url, "^(?i)https?://[^/?#]+([^?#]*)", 1)
    val rawQuery = regexp_extract(url, "^[^?#]*\\?([^#]*)", 1)

    // default-port compare on the zero-stripped DIGIT STRING — an
    // int cast would null out on overflow (':99999999999') and send the
    // port down the drop branch, another conflation channel
    val portNorm = regexp_replace(port, "^0+", "")
    val keepPort = port =!= "" &&
      !(scheme === "http" && portNorm === "80") &&
      !(scheme === "https" && portNorm === "443")
    val portPart = when(keepPort, concat(lit(":"), port)).otherwise("")

    val trimmedPath = regexp_replace(rawPath, "/+$", "")
    val pathPart = when(trimmedPath === "", "/").otherwise(trimmedPath)

    val params = filter(split(rawQuery, "&"),
      p => length(p) > 0 && !p.startsWith("utm_"))
    val cleanQuery = array_join(params, "&")
    val queryPart = when(cleanQuery === "", "")
      .otherwise(concat(lit("?"), cleanQuery))

    when(!url.rlike(StrictUrlRe), url) // unparseable: identity, never conflated
      .otherwise(concat(scheme, lit("://"), host, portPart, pathPart, queryPart))
  }

  /** Lowercased host of an http(s) URL ('' when unparseable). */
  def host(url: Column): Column = lower(regexp_extract(url, SchemeHostRe, 2))

  /** Domain-blocklist admission — the crawl-curation companion to the
    * canonicalization pass: drop every page whose (lowercased) host is
    * on the blocklist. The blocklist is vocabulary-sized at any corpus
    * scale, so it broadcasts and the corpus side never shuffles
    * (left_anti broadcast join on the extracted host). Unparseable
    * URLs have host '' and are kept unless '' is blocked — a filter
    * must not silently eat malformed records. */
  def domainFilter(df: DataFrame, urlCol: String,
                   blockedHosts: DataFrame): DataFrame = {
    val blocked = blockedHosts.select(
      lower(blockedHosts.columns.headOption.map(col)
        .getOrElse(col("host"))).as("__blocked_host"))
    df.withColumn("__host", host(col(urlCol)))
      .join(broadcast(blocked), col("__host") === col("__blocked_host"),
        "left_anti")
      .drop("__host")
  }

  /** Per-row canonical URL and its group's minimum id: (idCol,
    * canon_url, keep_id). "Keep one page per canonical URL" is then the
    * `idCol = keep_id` filter, exactly the t06 exact-dedup shape.
    *
    * A NULL url canonicalizes to NULL; such rows pass through as their
    * OWN singleton groups (keep_id = own id) — NULL urls must neither
    * vanish (a null-unsafe join would drop them) nor conflate with each
    * other. The `__nk` tiebreak column (own id for NULL keys, 0
    * otherwise) makes the null-safe group/join keys unique per NULL row
    * while leaving real groups untouched; one shuffle partitioning
    * still serves both the aggregate and the join back. */
  def resolve(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val canon = df
      .select(col(idCol), canonicalize(col(urlCol)).as("canon_url"))
      .withColumn("__nk",
        when(col("canon_url").isNull, col(idCol)).otherwise(lit(0L)))
    val keep = canon.groupBy(col("canon_url"), col("__nk"))
      .agg(min(col(idCol)).as("keep_id"))
      .withColumnRenamed("canon_url", "__canon_r")
      .withColumnRenamed("__nk", "__nk_r")
    // join key = the aggregation key: one shuffle partitioning serves
    // both; <=> keeps NULL-keyed rows (each its own group via __nk)
    canon.join(keep,
        canon("canon_url") <=> keep("__canon_r") &&
          canon("__nk") === keep("__nk_r"))
      .select(col(idCol), col("canon_url"), col("keep_id"))
  }
}
