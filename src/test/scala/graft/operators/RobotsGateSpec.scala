package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Robots gate: longest-match + allow-tie semantics, default-allow,
  * host case-insensitivity, unparseable URLs, and the one-join plan. */
class RobotsGateSpec extends SparkSpec {
  import testImplicits._

  private val rules = Seq(
    ("a.com", false, "/p"),
    ("a.com", true, "/p/pub"),
    ("a.com", false, "/p/pub/x"),
    ("b.com", false, "/"),
    ("tie.com", false, "/t"),
    ("tie.com", true, "/t"))

  private def gate(urls: Seq[(Long, String)]): Map[Long, (Boolean, Option[String])] =
    RobotsGate.gate(urls.toDF("id", "url"), "id", "url",
        rules.toDF("host", "allow", "prefix"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(3), Option(r.getString(4)))))
      .toMap

  test("longest match wins, then allow beats disallow on a tie") {
    val out = gate(Seq(
      1L -> "https://a.com/p/secret",     // /p disallow
      2L -> "https://a.com/p/pub/ok",     // /p/pub allow beats /p
      3L -> "https://a.com/p/pub/x/no",   // /p/pub/x disallow beats /p/pub
      4L -> "https://a.com/other",        // no rule matches
      5L -> "https://b.com/anything",     // whole-host disallow
      6L -> "https://tie.com/t/page",     // equal-length tie -> allow
      7L -> "https://c.com/x"))           // rule-free host
    assert(out(1L) === ((false, Some("/p"))))
    assert(out(2L) === ((true, Some("/p/pub"))))
    assert(out(3L) === ((false, Some("/p/pub/x"))))
    assert(out(4L) === ((true, None)))
    assert(out(5L) === ((false, Some("/"))))
    assert(out(6L) === ((true, Some("/t"))))
    assert(out(7L) === ((true, None)))
  }

  test("hosts match case-insensitively; empty path defaults to /; bad URLs pass") {
    val out = gate(Seq(
      1L -> "https://B.COM",              // empty path -> "/" -> blocked
      2L -> "HTTPS://A.com/p/x",          // scheme/host case
      3L -> "not a url at all"))
    assert(out(1L) === ((false, Some("/"))))
    assert(out(2L) === ((false, Some("/p"))))
    assert(out(3L) === ((true, None)))
    val parsed = RobotsGate.gate(Seq((3L, "not a url at all")).toDF("id", "url"),
      "id", "url", rules.toDF("host", "allow", "prefix")).collect().head
    assert(parsed.isNullAt(1) && parsed.isNullAt(2), "unparseable URL has NULL host/path")
  }

  test("query and fragment do not defeat a prefix match") {
    val out = gate(Seq(1L -> "https://a.com/p/x?q=1#frag"))
    assert(out(1L) === ((false, Some("/p"))))
  }

  test("reserved id-column names are rejected, not silently shadowed") {
    intercept[IllegalArgumentException] {
      RobotsGate.gate(Seq((1L, "https://a.com/")).toDF("host", "url"),
        "host", "url", rules.toDF("host", "allow", "prefix"))
    }
  }

  test("plan: exactly one join with the rule table, no cartesian product") {
    val df = RobotsGate.gate(
      (0L until 100L).map(i => (i, s"https://a.com/p/$i")).toDF("id", "url"),
      "id", "url", rules.toDF("host", "allow", "prefix"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), s"cartesian product in:\n$plan")
  }
}
