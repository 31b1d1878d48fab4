package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PII truth table (each category, multiples, cross-category order) and
  * the domain-blocklist admission semantics. */
class PiiRedactSpec extends SparkSpec {
  import testImplicits._

  private def run(texts: String*): Seq[(Long, Long, Long, Long, Long, String)] =
    PiiRedact.redact(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .orderBy(col("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
      .toSeq

  test("redaction truth table") {
    val got = run(
      "write to alice.b+tag@sub.example.co today",
      "server at 192.168.1.77 responded",
      "call +1 555-0134 now",
      "none of the above here",
      "two mails a@b.io and c@d.org plus 10.0.0.1",
      // an IP must be consumed by the IP pass, NOT the phone pattern
      "+49 555-1234 vs 12.34.56.78",
      "")
    assert(got(0) == ((0L, 1L, 0L, 0L, 0L, "write to <EMAIL> today")))
    assert(got(1) == ((1L, 0L, 0L, 1L, 0L, "server at <IP> responded")))
    assert(got(2) == ((2L, 0L, 0L, 0L, 1L, "call <PHONE> now")))
    assert(got(3) == ((3L, 0L, 0L, 0L, 0L, "none of the above here")))
    assert(got(4) == ((4L, 2L, 0L, 1L, 0L, "two mails <EMAIL> and <EMAIL> plus <IP>")))
    assert(got(5) == ((5L, 0L, 0L, 1L, 1L, "<PHONE> vs <IP>")))
    assert(got(6) == ((6L, 0L, 0L, 0L, 0L, "")))
  }

  test("card redaction: Luhn gate, not shape alone") {
    val got = run(
      "pay 4111111111111111 now",            // classic Luhn-valid test number
      "acct 4111111111111112 here",          // checksum fails → kept
      "id 123456789012 short",               // 12 digits: below card shape
      "two 4111111111111111 and 5500005555555559 cards",
      "a@b.io then 4111111111111111 from 10.0.0.1",
      "run 12345678901234567890 too long")   // 20 digits: no interior boundary
    assert(got(0) == ((0L, 0L, 1L, 0L, 0L, "pay <CARD> now")))
    assert(got(1) == ((1L, 0L, 0L, 0L, 0L, "acct 4111111111111112 here")))
    assert(got(2) == ((2L, 0L, 0L, 0L, 0L, "id 123456789012 short")))
    assert(got(3) == ((3L, 0L, 2L, 0L, 0L, "two <CARD> and <CARD> cards")))
    assert(got(4) == ((4L, 1L, 1L, 1L, 0L, "<EMAIL> then <CARD> from <IP>")))
    assert(got(5) == ((5L, 0L, 0L, 0L, 0L, "run 12345678901234567890 too long")))
  }

  test("card redaction is word-bounded: no splice inside longer runs") {
    val got = run(
      // the valid card's digits ALSO appear inside a 20-digit run and
      // an alphanumeric token — only the word-bounded occurrence may
      // be redacted; a literal substring replace would splice both
      "pay 4111111111111111 ref 94111111111111111138 id x4111111111111111y")
    assert(got(0) == ((0L, 0L, 1L, 0L, 0L,
      "pay <CARD> ref 94111111111111111138 id x4111111111111111y")))
  }

  test("NULL text: zero counts, empty redaction") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val rows = java.util.Arrays.asList(org.apache.spark.sql.Row(1L, null))
    val got = PiiRedact.redact(spark.createDataFrame(rows, schema)).collect().head
    assert((got.getLong(1), got.getLong(2), got.getLong(3), got.getLong(4),
      got.getString(5)) == ((0L, 0L, 0L, 0L, "")))
  }

  test("domain filter drops blocked hosts, keeps unparseable URLs") {
    val rows = Seq(
      (1L, "https://Bad.example.com/x"),   // blocked (case-insensitive)
      (2L, "https://good.example.com/x"),  // kept
      (3L, "HTTP://BAD.EXAMPLE.COM:8080/y?z=1"), // blocked, port/query noise
      (4L, "not a url"),                   // kept: host '' not blocked
      (5L, "https://bad.example.com.evil.org/") // kept: different host
    ).toDF("doc_id", "url")
    val blocked = Seq("bad.example.com").toDF("host")
    val kept = UrlDedup.domainFilter(rows, "url", blocked)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L, 5L))
  }
}
