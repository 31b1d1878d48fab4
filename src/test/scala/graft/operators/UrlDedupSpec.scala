package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Canonicalization truth table (each rule in isolation and combined)
  * plus keep-min group resolution. */
class UrlDedupSpec extends SparkSpec {
  import testImplicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(UrlDedup.canonicalize(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("canonicalization truth table") {
    val vectors = Seq(
      // scheme+host lowercase, default https port, fragment
      "HTTPS://Example.COM:443/a/1#frag" -> "https://example.com/a/1",
      // default http port + root path
      "http://example.com:80/" -> "http://example.com/",
      // non-default port KEPT
      "http://example.com:8080/x" -> "http://example.com:8080/x",
      // utm params stripped, others kept in original order
      "https://example.com/a?utm_source=x&id=3&utm_campaign=y"
        -> "https://example.com/a?id=3",
      // trailing slash run + query emptied entirely
      "https://example.com/a///?utm_source=x" -> "https://example.com/a",
      // no path -> '/'
      "https://example.com" -> "https://example.com/",
      // unparseable input: identity, never conflated
      "not a url" -> "not a url",
      // combined: host case + kept param + stripped utm + fragment
      "https://EX.com/p?page=2&utm_x=1#z" -> "https://ex.com/p?page=2",
      // utm_ must be a PREFIX match on the parameter, not a substring
      "https://example.com/p?xutm_a=1" -> "https://example.com/p?xutm_a=1",
      // malformed port: identity — MUST NOT conflate with http://a.com/x
      "http://a.com:abc/x" -> "http://a.com:abc/x",
      // int-overflowing port is a real distinct port: kept verbatim
      "http://a.com:99999999999/x" -> "http://a.com:99999999999/x",
      // zero-padded default port still recognized as default
      "http://a.com:0080/x" -> "http://a.com/x")
    canon(vectors.map(_._1): _*).zip(vectors).foreach {
      case (got, (in, want)) => assert(got == want, s"canon($in)")
    }
  }

  test("resolve keeps the minimum id per canonical group") {
    val rows = Seq(
      (10L, "https://A.com/x"),
      (3L, "HTTPS://a.com:443/x#f"),
      (7L, "https://a.com/x?utm_source=z"),
      (5L, "https://b.com/y"),
      (6L, "not a url"),
      (8L, "not a url")).toDF("doc_id", "url")
    val got = UrlDedup.resolve(rows, "doc_id", "url")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(10L) == (("https://a.com/x", 3L)))
    assert(got(3L) == (("https://a.com/x", 3L)))
    assert(got(7L) == (("https://a.com/x", 3L)))
    assert(got(5L) == (("https://b.com/y", 5L)))
    // identical garbage strings still group exactly (string equality),
    // but parseable and unparseable keys never mix
    assert(got(6L) == (("not a url", 6L)) && got(8L) == (("not a url", 6L)))
    // survivors = one per group
    assert(got.count { case (id, (_, keep)) => id == keep } == 3)
  }

  test("resolve passes NULL urls through as their own singleton groups") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("url", StringType)))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, "https://a.com/x"),
      org.apache.spark.sql.Row(2L, null),
      org.apache.spark.sql.Row(3L, null),
      org.apache.spark.sql.Row(4L, "https://a.com/x"))
    val got = UrlDedup.resolve(spark.createDataFrame(rows, schema),
        "doc_id", "url")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), r.getLong(2))).toMap
    // NULL urls neither vanish nor conflate: each keeps itself
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(2L) == ((None, 2L)) && got(3L) == ((None, 3L)))
    assert(got(1L) == ((Some("https://a.com/x"), 1L)) &&
      got(4L) == ((Some("https://a.com/x"), 1L)))
  }
}
