package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.ReferenceFunctions._

/** Property-based invariants (SURVEY.md §5.3): stats bounds, trim
  * invariance for aligned files, P13 canonicalization stability, P1
  * round-trip, unpivot/pivot round-trip. Generators are seeded small —
  * each property materializes a DataFrame per case, so cases are few
  * but adversarial. */
class PropertiesSpec extends SparkSpec {
  import testImplicits._

  /** Draw `n` deterministic samples from a generator (seeded, so runs
    * are reproducible — a failure is always reproducible). */
  private def samples[A](g: Gen[A], n: Int = 10): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private def forAll[A](g: Gen[A])(body: A => Unit): Unit =
    samples(g).foreach(body)

  test("property: min <= mean <= max for any non-empty channel") {
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6))) { xs: List[Double] =>
      val df = xs.map(Tuple1(_)).toDF("ch")
      val r = ChannelStats(df, Seq("ch")).head
      val (mean, mn, mx) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      // rounding to 3dp can nudge bounds by half an ulp of the rounding
      assert(mn <= mean + 0.001 && mean <= mx + 0.001)
      assert(mn <= mx)
    }
  }

  test("property: exact dedup keep_id is the min id of each duplicate group") {
    forAll(Gen.listOfN(20, Gen.oneOf("aa", "bb", "cc", "dd"))) { texts: List[String] =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = Dedup.exact(df, "text", "doc_id").collect()
      val expected = texts.zipWithIndex.groupBy(_._1)
        .map { case (t, g) => t -> (g.map(_._2.toLong).min, g.size.toLong) }
      assert(out.length == expected.size)
      out.foreach { r =>
        // fingerprint groups match text groups for these simple tokens
        val (keep, n) = (r.getLong(1), r.getLong(2))
        assert(expected.values.exists { case (k, c) => k == keep && c == n })
      }
    }
  }

  test("property: P1 OLE round-trip within a microsecond") {
    forAll(Gen.chooseNum(25569.0, 80000.0)) { ole: Double =>
      val micros = Seq(ole).toDF("o")
        .select(oleToEpochMicros(col("o"))).head.getLong(0)
      val back = (micros / 86400e6) + OleEpochDays
      assert(math.abs(back - ole) * 86400e6 < 1.5) // < 1.5 µs
    }
  }

  test("property: P13 event id ignores key order (canonical JSON contract)") {
    forAll(Gen.zip(Gen.alphaNumStr.suchThat(_.nonEmpty), Gen.alphaNumStr.suchThat(_.nonEmpty))) {
      case (a: String, b: String) =>
        // canonical = sorted keys; builder must produce identical strings
        // regardless of insertion order
        val sortedJson = s"""{"a":"$a","b":"$b"}"""
        val df = Seq((a, b)).toDF("a", "b")
        val id1 = df.select(eventId(
          concat(lit("{\"a\":\""), col("a"), lit("\",\"b\":\""), col("b"), lit("\"}"))))
          .head.getString(0)
        val id2 = Seq(sortedJson).toDF("j").select(eventId(col("j"))).head.getString(0)
        assert(id1 == id2)
    }
  }

  test("property: trim is a no-op for aligned windows (skip = 0)") {
    forAll(Gen.listOfN(30, Gen.chooseNum(-100.0, 100.0))) { xs: List[Double] =>
      val df = xs.zipWithIndex.map { case (v, i) => (i.toDouble, v) }.toDF("rel", "v")
      // aligned ⇒ no warm-up filter applied; stats equal the full-column stats
      val full = ChannelStats(df, Seq("v")).head
      val refAvg = BigDecimal(xs.sum / xs.size)
        .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(full.getDouble(1) - refAvg) <= 0.001)
      assert(full.getDouble(2) == BigDecimal(xs.min).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(full.getDouble(3) == BigDecimal(xs.max).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("extended stats: approx-percentile default tracks the exact path") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val exact = ChannelStats.extended(df, Seq("l_quantity"), exact = true).head
    val approx = ChannelStats.extended(df, Seq("l_quantity")).head
    // same non-percentile columns; percentiles within sketch tolerance
    assert(exact.getDouble(1) == approx.getDouble(1)) // mean
    assert(math.abs(exact.getDouble(3) - approx.getDouble(3)) <= 1.0) // p50
    assert(math.abs(exact.getDouble(4) - approx.getDouble(4)) <= 1.0) // p90
  }

  test("property: R1 stats→KV reshape emits exactly 3 rows per sensor") {
    forAll(Gen.chooseNum(1, 5)) { n: Int =>
      val cols = (0 until n).map(i => s"c$i")
      val df = Seq.tabulate(10)(i =>
        (i.toDouble, i * 2.0, i * 3.0, i * 4.0, i * 5.0))
        .toDF("c0", "c1", "c2", "c3", "c4")
        .select(cols.map(col): _*)
      val stats = ChannelStats(df, cols)
      val kv = KvReshape.statsToKv(stats, "sensor", Seq("mean", "minimum", "maximum"))
      assert(kv.count() == 3L * n)
      val keys = kv.select("kv_key").collect().map(_.getString(0))
      assert(keys.forall(k => k.matches("c\\d:(mean|minimum|maximum)")))
    }
  }

  /** Brute-force reference for [[SpanDedup]]: windows via sliding,
    * corpus-wide multiset count, positions covered by dup windows. */
  private def bruteScrub(texts: Seq[(Long, String)], w: Int)
      : Map[Long, (Long, Long, String)] = {
    val toks = texts.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }.toMap
    val wins = toks.toSeq.flatMap { case (id, ts) =>
      if (ts.length < w) Seq.empty
      else ts.sliding(w).zipWithIndex.map { case (g, i) => (id, i + 1, g.mkString(" ")) }.toSeq
    }
    val counts = wins.groupBy(_._3).map { case (g, xs) => g -> xs.size }
    texts.map { case (id, _) =>
      val ts = toks(id)
      val dupStarts = wins.filter(x => x._1 == id && counts(x._3) >= 2).map(_._2)
      val removed = dupStarts.flatMap(i => i until (i + w)).toSet
      val kept = ts.zipWithIndex.collect { case (t, p) if !removed.contains(p + 1) => t }
      id -> ((ts.length.toLong, removed.size.toLong, kept.mkString(" ")))
    }.toMap
  }

  test("property: span scrub equals the brute-force sliding-window reference") {
    val word = Gen.oneOf("a", "b", "c", "d", "e")
    val doc = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    forAll(Gen.listOfN(6, doc)) { texts: List[String] =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = rows.toDF("doc_id", "text")
      val got = SpanDedup.removeDuplicateSpans(df, window = 3)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      val want = bruteScrub(rows, 3)
      assert(got === want, s"corpus: $rows")
    }
  }

  test("property: token budget equals the brute-force greedy prefix") {
    val doc = Gen.chooseNum(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("the", "word", "data", "of")).map(_.mkString(" ")))
    forAll(Gen.listOfN(12, doc)) { texts: List[String] =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = rows.toDF("doc_id", "text")
      val budget = 40L
      val got = Selection.tokenBudget(df, budget = budget)
        .collect().map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1)
      // reference: quality from the operator's own scorer (same rounding),
      // order (quality desc, id), inclusive cumulative cut
      val scored = df.select(col("doc_id"),
          graft.functions.TextFunctions.qualityScore(col("text")).as("q"),
          graft.functions.TextFunctions.tokenCount(col("text")).as("n"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      var acc = 0L
      val want = scored.sortBy { case (id, q, _) => (-q, id) }
        .flatMap { case (id, _, n) =>
          acc += n
          if (acc <= budget) Some((id, acc)) else None
        }.sortBy(_._1)
      assert(got.toSeq === want.toSeq, s"corpus: $rows")
    }
  }
}
