package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Frontier politeness scheduling: slot semantics, budget cap,
  * malformed hosts, and the one-exchange plan shape. */
class FrontierSpec extends SparkSpec {
  import testImplicits._

  private val urls = Seq(
    (1L, "https://a.com/x", 50L),
    (2L, "https://a.com/y", 90L),
    (3L, "https://a.com/z", 90L), // priority tie with 2 → url breaks it
    (4L, "https://b.com/1", 10L),
    (5L, "not a url", 99L)        // unparseable host → '' group, kept
  ).toDF("doc_id", "url", "priority")

  test("slot = per-host priority rank; one URL per host per slot") {
    val out = Frontier.schedule(urls, "url", "priority",
        tieCols = Seq("url", "doc_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[String]("host"), r.getAs[Long]("slot"))).toMap
    assert(out(2L) === (("a.com", 1L))) // 90, url y < z
    assert(out(3L) === (("a.com", 2L)))
    assert(out(1L) === (("a.com", 3L)))
    assert(out(4L) === (("b.com", 1L)))
    assert(out(5L)._2 === 1L, "malformed host schedules in its own group")
    // politeness invariant: (host, slot) unique
    val hs = out.values.toSeq
    assert(hs.distinct.size === hs.size)
  }

  test("per-host budget drops beyond-cap URLs only") {
    val out = Frontier.schedule(urls, "url", "priority",
        tieCols = Seq("url", "doc_id"), maxPerHost = Some(2))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out === Set(2L, 3L, 4L, 5L), "doc 1 is a.com's rank 3 → dropped")
  }

  test("plan: the host window partition is the only hash exchange") {
    val df = Frontier.schedule(urls.repartition(3), "url", "priority",
      tieCols = Seq("doc_id"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val keys = "hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(plan)
      .map(_.group(1)).toSeq
    assert(keys.nonEmpty && keys.forall(_.contains("host")),
      s"every hash exchange must key on host, got $keys in:\n$plan")
  }
}
