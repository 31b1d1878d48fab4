package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robots-exclusion gating (RFC 9309 / the classic robots.txt
  * longest-match rule): decide per URL whether a polite crawler may
  * fetch it, given a parsed per-host rule table. The companion of the
  * frontier scheduler (t81) — Mercator-style crawlers apply exactly
  * this gate between frontier pop and fetch.
  *
  * Semantics (the spec's, deterministically):
  *   - a rule is (host, allow, prefix); a rule matches when the URL's
  *     host equals it and the URL's path starts with the prefix.
  *     Prefixes are LITERAL: RFC 9309 wildcards ('*', '$') are NOT
  *     interpreted — the rule table must be pre-expanded to literal
  *     prefixes by the robots.txt parser, and a prefix containing
  *     either metacharacter fails the query (raise_error) rather than
  *     silently never matching;
  *   - the LONGEST matching prefix wins; at equal length Allow beats
  *     Disallow (two distinct equal-length prefixes cannot both match
  *     one path, so (length, allow) is a total tie-break);
  *   - no matching rule ⇒ allowed.
  *
  * Scale shape: host/path extraction is scan-stage regex; the rule
  * match is ONE equi-join on host — rule tables are tiny next to a
  * crawl corpus (AQE broadcasts them), and even a giant rule corpus
  * joins hash-partitioned by host with no skew beyond the host
  * distribution itself. The winner is a single max(struct(len, allow))
  * aggregation per URL — no window, no per-rule loop. */
object RobotsGate {

  /** urls(idCol, urlCol) × rules(host, allow BOOLEAN, prefix) →
    * (idCol, host, path, allowed, rule_prefix). Hosts are matched
    * case-insensitively (lowercased on both sides); an empty path is
    * "/"; URLs that don't parse get host/path NULL and are allowed
    * (no rule can match them). */
  /** Output/internal names the gate generates; an id column with one of
    * these would be silently shadowed (the CmsSketch/HllSketch guard
    * convention, per the round-8 advice). */
  private val reserved = Set("host", "path", "allowed", "rule_allow", "rule_prefix")

  def gate(urls: DataFrame, idCol: String, urlCol: String,
           rules: DataFrame): DataFrame = {
    require(!reserved.contains(idCol),
      s"id column '$idCol' collides with RobotsGate output names " +
        s"(${reserved.toSeq.sorted.mkString(", ")}); rename it first")
    val host = lower(regexp_extract(col(urlCol), "^(?i)https?://([^/:?#]+)", 1))
    val rawPath = regexp_extract(col(urlCol), "^(?i)https?://[^/?#]+([^?#]*)", 1)
    val parsed = urls.select(col(idCol),
      when(host === "", lit(null)).otherwise(host).as("host"),
      when(host === "", lit(null))
        .otherwise(when(rawPath === "", "/").otherwise(rawPath)).as("path"))
    val r = rules.select(lower(col("host")).as("host"),
      col("allow").cast("boolean").as("allow"),
      when(col("prefix").contains("*") || col("prefix").contains("$"),
        raise_error(concat(
          lit("RobotsGate: wildcard rule prefix unsupported — pre-expand " +
            "robots.txt rules to literal prefixes: "), col("prefix"))))
        .otherwise(col("prefix")).as("prefix"))
    val won = parsed.join(r, Seq("host"))
      .where(col("path").startsWith(col("prefix")))
      .groupBy(col(idCol))
      .agg(max(struct(length(col("prefix")).as("l"),
        col("allow").cast("int").as("a"), col("prefix").as("p"))).as("m"))
      .select(col(idCol), (col("m.a") === 1).as("rule_allow"),
        col("m.p").as("rule_prefix"))
    parsed.join(won, Seq(idCol), "left")
      .select(col(idCol), col("host"), col("path"),
        coalesce(col("rule_allow"), lit(true)).as("allowed"),
        col("rule_prefix"))
  }
}
