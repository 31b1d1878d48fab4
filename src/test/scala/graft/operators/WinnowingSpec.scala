package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Winnowing: parity with a sequential reference implementation, the
  * paper's coverage guarantee, planted-copy sharing, and partitioning
  * independence. */
class WinnowingSpec extends SparkSpec {
  import testImplicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Sequential reference winnowing (the paper's formulation): slide a
    * w-window over the gram hashes, record each window's minimum VALUE.
    * Short documents (< w grams) keep their single truncated window. */
  private def reference(text: String, k: Int, w: Int): Set[String] = {
    val ts = text.trim.toLowerCase.split("\\s+").toSeq
    if (ts.length < k) Set.empty
    else {
      val hs = (0 to ts.length - k).map(i => md5hex(ts.slice(i, i + k).mkString(" ")))
      val starts = 0 to math.max(0, hs.length - w)
      starts.map(s => hs.slice(s, s + w).min).toSet
    }
  }

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "a completely different document with its own distinct vocabulary here now"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank today"), // copy of 1
    (4L, "short doc"),            // < k tokens → zero fingerprints
    (5L, "one two three four"),   // exactly k tokens → 1 gram, 1 fingerprint
    (6L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("fingerprint sets match the sequential reference winnower") {
    val got = Winnowing.fingerprints(docs, "doc_id", "text", k = 4, w = 5)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getString(1)).toSet }
    docs.collect().foreach { r =>
      val id = r.getLong(0)
      val expect = reference(Option(r.getString(1)).getOrElse(""), 4, 5)
      assert(got.getOrElse(id, Set.empty) === expect, s"doc $id")
    }
  }

  test("coverage guarantee: every full window is represented") {
    // any w consecutive gram hashes must contain a selected value
    val text = (1 to 40).map(i => s"tok${i % 13}").mkString(" ")
    val df = Seq((9L, text)).toDF("doc_id", "text")
    val fps = Winnowing.fingerprints(df, "doc_id", "text", k = 4, w = 5)
      .collect().map(_.getString(1)).toSet
    val ts = text.split("\\s+").toSeq
    val hs = (0 to ts.length - 4).map(i => md5hex(ts.slice(i, i + 4).mkString(" ")))
    (0 to hs.length - 5).foreach { s =>
      assert(hs.slice(s, s + 5).exists(fps.contains), s"window at $s uncovered")
    }
  }

  test("profile: an exact copy shares every fingerprint; short docs are zero rows") {
    val p = Winnowing.profile(docs, "doc_id", "text", k = 4, w = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (g1, n1, s1) = p(1L)
    assert(g1 === 11L && n1 > 0 && s1 === n1, "copy 3 must share all of doc 1's fps")
    assert(p(3L) === p(1L))
    val (_, n2, s2) = p(2L)
    assert(n2 > 0 && s2 === 0L, "unique doc shares nothing")
    assert(p(4L) === ((0L, 0L, 0L)))
    assert(p(5L) === ((1L, 1L, 0L)))
    assert(p(6L) === ((0L, 0L, 0L)))
  }

  test("results are partitioning-independent") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Winnowing.profile(df, "doc_id", "text").orderBy("doc_id").collect().toSeq
    assert(run(docs.repartition(5)) === run(docs.coalesce(1)))
  }
}
