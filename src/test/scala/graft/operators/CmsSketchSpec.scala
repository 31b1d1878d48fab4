package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Counter exactness, mergeability, the no-underestimate guarantee,
  * and heavy-hitter completeness (no false negatives). */
class CmsSketchSpec extends SparkSpec {
  import testImplicits._

  // independent reference: counter index = first 3 md5 hex chars
  private def refIdx(j: Int, s: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$s".getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString
    Integer.parseInt(hex.substring(0, 3), 16)
  }

  test("cells match the bit-level reference") {
    val vals = (0 until 200).map(i => s"tok-${i % 40}")
    val got = CmsSketch.sketch(vals.toDF("v"), Nil, col("v"))
      .collect()
      .map(r => ((r.getAs[Int]("j"), r.getAs[Int]("idx")), r.getAs[Long]("c")))
      .toMap
    val expect = vals.flatMap(v => (0 until CmsSketch.Depth).map(j =>
        (j, refIdx(j, v))))
      .groupBy(identity).map { case (k, xs) => (k, xs.size.toLong) }
    assert(got === expect)
  }

  test("merge of shard sketches equals the sketch of the union") {
    val a = (0 until 3000).map(i => s"a-${i % 311}").toDF("v")
    val b = (0 until 3000).map(i => s"b-${i % 97}").toDF("v")
    val merged = CmsSketch.merge(
      CmsSketch.sketch(a, Nil, col("v")),
      CmsSketch.sketch(b, Nil, col("v")), Nil)
    val whole = CmsSketch.sketch(a.union(b), Nil, col("v"))
    assert(merged.except(whole).count() === 0)
    assert(whole.except(merged).count() === 0)
  }

  test("sketch is partition-independent") {
    val df = (0 until 2000).map(i => s"x-${i % 500}").toDF("v")
    val one = CmsSketch.sketch(df.coalesce(1), Nil, col("v"))
    val many = CmsSketch.sketch(df.repartition(13), Nil, col("v"))
    assert(one.except(many).count() === 0)
    assert(many.except(one).count() === 0)
  }

  test("estimates never underestimate the true count") {
    val vals = (0 until 10000).map(i => s"w-${i % 800}")
    val df = vals.toDF("v")
    val truth = vals.groupBy(identity).map { case (v, xs) => (v, xs.size.toLong) }
    val est = CmsSketch.estimate(
        CmsSketch.sketch(df, Nil, col("v")), df.distinct(), col("v"))
      .collect().map(r => (r.getAs[String]("__v"), r.getAs[Long]("est")))
    assert(est.length === 800)
    est.foreach { case (v, e) =>
      assert(e >= truth(v), s"underestimate for $v: $e < ${truth(v)}")
    }
  }

  test("heavy hitters include every truly-heavy value") {
    // 10 planted heavy tokens (300 each) over a 700-token noise tail
    val heavy = (0 until 10).flatMap(h => Seq.fill(300)(s"heavy-$h"))
    val noise = (0 until 2000).map(i => s"noise-${i % 700}")
    val df = (heavy ++ noise).toDF("v")
    val n = heavy.size + noise.size // 5000; threshold 0.5% = 25
    val got = CmsSketch.heavyHitters(df, col("v"), minShare = 0.005)
      .collect().map(r => (r.getAs[String]("v"), r.getAs[Long]("est"))).toMap
    (0 until 10).foreach { h =>
      assert(got.contains(s"heavy-$h"), s"missing heavy-$h")
      assert(got(s"heavy-$h") >= 300)
    }
    // noise tokens appear at most via collision overestimates; every
    // reported estimate still clears the threshold
    got.values.foreach(e => assert(e >= math.ceil(n * 0.005).toLong))
  }

  test("per-group heavy hitters threshold against each group's OWN total") {
    // group a: "big" is 50% of a small stream; group b: the same token
    // is 0.5% of a much larger stream — heavy in a only
    val a = Seq.fill(50)(("a", "big")) ++ (0 until 50).map(i => ("a", s"x$i"))
    val b = Seq.fill(10)(("b", "big")) ++ (0 until 1990).map(i => ("b", s"y${i % 800}"))
    val df = (a ++ b).toDF("g", "v")
    val got = CmsSketch.heavyHittersBy(df, Seq("g"), col("v"), minShare = 0.3)
      .collect().map(r => (r.getString(0), r.getAs[String]("v"))).toSet
    assert(got.contains(("a", "big")))
    assert(!got.exists(_._1 == "b"), s"group b has no 30%-heavy value: $got")
    // and per-group results equal the global pass run on each slice
    val aOnly = CmsSketch.heavyHitters(a.toDF("g", "v").select(col("v")),
        col("v"), minShare = 0.3)
      .collect().map(_.getAs[String]("v")).toSet
    assert(got.collect { case ("a", v) => v } == aOnly)
  }

  test("NULL values are skipped, empty input yields no cells") {
    val df = Seq("x", null: String).toDF("v")
    assert(CmsSketch.sketch(df, Nil, col("v")).count() === CmsSketch.Depth)
    assert(CmsSketch.sketch(df.where(lit(false)), Nil, col("v"))
      .count() === 0)
  }

  // Pinned point-query vectors: the expected estimate for every candidate
  // (present AND absent) is computed by an INDEPENDENT in-spec CMS built
  // from java MessageDigest — min over depth rows of the summed collision
  // cells, the Cormode & Muthukrishnan 2005 readout evaluated outside
  // Spark. Exact equality pins the whole md5 → idx → left-join → min
  // channel, not just the no-underestimate inequality.
  test("point estimates equal the independent reference CMS exactly") {
    val stream = (0 until 3000).map(i => s"tok-${i % 250}")
    val truthCells: Map[(Int, Int), Long] = stream
      .flatMap(v => (0 until CmsSketch.Depth).map(j => (j, refIdx(j, v))))
      .groupBy(identity).map { case (k, xs) => (k, xs.size.toLong) }
    def refEstimate(v: String): Long =
      (0 until CmsSketch.Depth)
        .map(j => truthCells.getOrElse((j, refIdx(j, v)), 0L)).min

    val candidates = ((0 until 250).map(i => s"tok-$i") ++
      (0 until 50).map(i => s"absent-$i")).toDF("v")
    val got = CmsSketch.estimate(
        CmsSketch.sketch(stream.toDF("v"), Nil, col("v")),
        candidates, col("v"))
      .collect().map(r => (r.getAs[String]("__v"), r.getAs[Long]("est")))
      .toMap
    assert(got.size === 300)
    got.foreach { case (v, e) =>
      assert(e === refEstimate(v), s"estimate mismatch for $v")
    }
    // absent candidates may only read collision mass, never negative
    (0 until 50).foreach(i => assert(got(s"absent-$i") >= 0L))
  }

  test("key columns colliding with internal names are rejected") {
    val df = Seq((1, "x")).toDF("j", "v")
    intercept[IllegalArgumentException] {
      CmsSketch.sketch(df, Seq("j"), col("v"))
    }
    intercept[IllegalArgumentException] {
      CmsSketch.merge(df, df, Seq("idx"))
    }
  }
}
