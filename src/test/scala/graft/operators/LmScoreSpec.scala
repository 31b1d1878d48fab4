package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bigram LM surprisal: closed-form values on a tiny corpus, guards for
  * short documents, and the ordering property the quality filter relies
  * on (templated text scores below rare text). */
class LmScoreSpec extends SparkSpec {
  import testImplicits._

  test("closed-form surprisal on a two-document corpus") {
    // corpus bigrams: doc1 = (a,b),(b,a),(a,b); doc2 = (a,b)
    // c(a,b)=3, c(b,a)=1; c1(a)=3, c1(b)=1; V=2
    // p(a,b) = 4/5, p(b,a) = 2/3
    val df = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = LmScore.surprisal(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    val s1 = (2 * -math.log(0.8) + -math.log(2.0 / 3.0)) / 3
    assert(out(0).getLong(1) == 3)
    assert(math.abs(out(0).getDouble(2) - (math.rint(s1 * 1e4) / 1e4)) < 1e-12)
    assert(out(1).getLong(1) == 1)
    assert(math.abs(out(1).getDouble(2) - (math.rint(-math.log(0.8) * 1e4) / 1e4)) < 1e-12)
  }

  test("documents with fewer than two tokens score 0 with 0 bigrams") {
    // doc 4 gives w1='two' a second continuation, so doc 3's bigram has
    // p < 1 and a strictly positive surprisal
    val df = Seq((1L, "solo"), (2L, ""), (3L, "two tokens"), (4L, "two step"))
      .toDF("doc_id", "text")
    val out = LmScore.surprisal(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 0 && out(0).getDouble(2) == 0.0)
    assert(out(1).getLong(1) == 0 && out(1).getDouble(2) == 0.0)
    assert(out(2).getLong(1) == 1 && out(2).getDouble(2) > 0.0)
  }

  test("repeated boilerplate scores lower surprisal than unique text") {
    val boiler = (1 to 20).map(i => (i.toLong, "click here to subscribe now"))
    val unique = Seq((100L, "zymurgy quixotic fjord waltz vexing"))
    val df = (boiler ++ unique).toDF("doc_id", "text")
    val out = LmScore.surprisal(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) < out(100L),
      s"boilerplate ${out(1L)} must undercut unique ${out(100L)}")
  }

  test("perplexity buckets: per-language terciles are 1/3 each and surprisal-monotone") {
    // 9 docs per language → percent_rank hits 0, 1/8 … 1; terciles 3/3/3
    val rows =
      (1L to 9L).map(i => (i, s"en doc $i " + ("common words here " * i.toInt), "en")) ++
      (11L to 19L).map(i => (i, s"de text $i " + ("andere worte hier " * (i.toInt - 10)), "de"))
    val out = LmScore.perplexityBuckets(
        rows.toDF("doc_id", "text", "lang"), "text", "doc_id", "lang")
      .collect()
    val byLang = out.groupBy(_.getString(1))
    for ((lang, rs) <- byLang) {
      val counts = rs.groupBy(_.getString(5)).map { case (b, x) => b -> x.length }
      assert(counts === Map("head" -> 3, "middle" -> 3, "tail" -> 3), s"$lang: $counts")
      val maxHead = rs.filter(_.getString(5) == "head").map(_.getDouble(3)).max
      val minTail = rs.filter(_.getString(5) == "tail").map(_.getDouble(3)).min
      assert(maxHead <= minTail, s"$lang: head $maxHead above tail $minTail")
    }
  }
}
