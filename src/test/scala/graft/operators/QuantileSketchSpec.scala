package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucket-layout exactness, mergeability, and the 1/16 relative-error
  * readout bound. */
class QuantileSketchSpec extends SparkSpec {
  import testImplicits._

  // independent bit-arithmetic reference for bucket id + lower bound
  private def refBucket(v: Long): Int =
    if (v == 0) -1
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val sub = if (e >= 4) ((v >> (e - 4)) - 16).toInt
      else ((v - (1L << e)) << (4 - e)).toInt
      e * 16 + sub
    }

  private def refLower(bucket: Int): Long =
    if (bucket == -1) 0L
    else {
      val e = bucket / 16; val sub = bucket % 16
      if (e >= 4) (16L + sub) << (e - 4) else (16L + sub) >> (4 - e)
    }

  private def sketchOf(vs: Seq[Long]) =
    QuantileSketch.sketch(vs.map(("g", _)).toDF("g", "v"), Seq("g"), col("v"))

  test("bucket ids match the bit-level reference on edge values") {
    val vals: Seq[Long] = Seq(0L, 1L, 2L, 3L, 7L, 8L, 15L, 16L, 17L, 31L,
      32L, 33L, 47L, 48L, 63L, 64L, 100L, 1023L, 1024L, (1L << 40) + 12345L,
      Long.MaxValue)
    val got = sketchOf(vals).collect()
      .map(r => r.getAs[Int]("bucket") -> r.getAs[Long]("c")).toMap
    val expect = vals.groupBy(refBucket).map { case (b, g) => b -> g.size.toLong }
    assert(got === expect)
    // 32 and 33 share the first coarse bucket; 16 and 17 do not
    assert(refBucket(32L) === refBucket(33L))
    assert(refBucket(16L) !== refBucket(17L))
  }

  test("lower bound inverts the bucket id exactly for v < 16") {
    // e < 4 buckets are narrower than 1: readout is EXACT
    val est = QuantileSketch.quantiles(sketchOf(Seq(13L)), Seq("g"), Seq(50))
      .collect()(0).getAs[Long]("est")
    assert(est === 13L)
    (0 to 15).foreach(v => assert(refLower(refBucket(v.toLong)) === v.toLong))
  }

  test("merge of shard sketches equals the sketch of the union") {
    val a = (1 to 3000).map(i => ("s", (i * 7919L) % 100000)).toDF("g", "v")
    val b = (1 to 3000).map(i => ("s", (i * 104729L) % 5000)).toDF("g", "v")
    val merged = QuantileSketch.merge(
      QuantileSketch.sketch(a, Seq("g"), col("v")),
      QuantileSketch.sketch(b, Seq("g"), col("v")), Seq("g"))
    val whole = QuantileSketch.sketch(a.union(b), Seq("g"), col("v"))
    assert(merged.except(whole).count() === 0)
    assert(whole.except(merged).count() === 0)
  }

  test("rollup collapses keys to the sketch of the concatenated groups") {
    val df = (1 to 5000)
      .map(i => (s"src${i % 4}", (i * 7919L) % 20000)).toDF("g", "v")
    val rolled = QuantileSketch.rollup(
      QuantileSketch.sketch(df, Seq("g"), col("v")))
    val direct = QuantileSketch.sketch(
      df.withColumn("g", lit("all")), Seq("g"), col("v")).drop("g")
    assert(rolled.except(direct).count() === 0)
    assert(direct.except(rolled).count() === 0)
    // keepKeys retains a prefix: per-g rollup of (g, v%2)-keyed sketches
    val two = QuantileSketch.sketch(
      df.withColumn("h", col("v") % 2), Seq("g", "h"), col("v"))
    val kept = QuantileSketch.rollup(two, Seq("g"))
    val perG = QuantileSketch.sketch(df, Seq("g"), col("v"))
    assert(kept.except(perG).count() === 0)
    assert(perG.except(kept).count() === 0)
  }

  test("sketch is partition-independent") {
    val df = (1 to 2000).map(i => ("g", i.toLong * 13)).toDF("g", "v")
    val one = QuantileSketch.sketch(df.coalesce(1), Seq("g"), col("v"))
    val many = QuantileSketch.sketch(df.repartition(13), Seq("g"), col("v"))
    assert(one.except(many).count() === 0)
    assert(many.except(one).count() === 0)
  }

  test("readout is within 1/16 below the exact order statistic") {
    val vals = (1 to 5000).map(i => ((i * 48271L) % 1000003) + 1)
    val sorted = vals.sorted
    val got = QuantileSketch.quantiles(sketchOf(vals), Seq("g"),
        Seq(10, 50, 90, 99)).collect()
      .map(r => r.getAs[Int]("q_pct") -> r.getAs[Long]("est")).toMap
    for (p <- Seq(10, 50, 90, 99)) {
      val exact = sorted((p * vals.size + 99) / 100 - 1)
      val est = got(p)
      assert(est <= exact, s"p$p: est $est above exact $exact")
      assert(exact < est + (est >> 4) + 1,
        s"p$p: est $est more than 1/16 below exact $exact")
    }
  }

  test("all-zero group reads out 0 at every percentile; n is carried") {
    val out = QuantileSketch.quantiles(sketchOf(Seq(0L, 0L, 0L)), Seq("g"),
      Seq(1, 50, 100)).collect()
    assert(out.length === 3)
    assert(out.forall(_.getAs[Long]("est") === 0L))
    assert(out.forall(_.getAs[Long]("n") === 3L))
  }

  test("NULL and negative values are skipped") {
    val df = Seq(("g", java.lang.Long.valueOf(5L)),
      ("g", null: java.lang.Long), ("g", java.lang.Long.valueOf(-3L)))
      .toDF("g", "v")
    val sk = QuantileSketch.sketch(df, Seq("g"), col("v")).collect()
    assert(sk.length === 1 && sk(0).getAs[Long]("c") === 1L)
  }

  test("key columns colliding with internal/output names are rejected") {
    val df = Seq(("g", 1L)).toDF("bucket", "v")
    intercept[IllegalArgumentException] {
      QuantileSketch.sketch(df, Seq("bucket"), col("v"))
    }
    intercept[IllegalArgumentException] {
      QuantileSketch.quantiles(df.toDF("n", "v"), Seq("n"), Seq(50))
    }
    intercept[IllegalArgumentException] {
      QuantileSketch.merge(df, df, Seq("c"))
    }
  }
}
