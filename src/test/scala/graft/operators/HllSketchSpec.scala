package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Register exactness, mergeability, and estimator accuracy. */
class HllSketchSpec extends SparkSpec {
  import testImplicits._

  // independent reference: md5 bytes -> bucket / 60-bit leading zeros
  private def ref(s: String): (Int, Int) = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString
    val bucket = Integer.parseInt(hex.substring(0, 2), 16)
    val v = new java.math.BigInteger(hex.substring(2, 17), 16)
    val rank = if (v.signum == 0) 61 else 61 - v.bitLength
    (bucket, rank)
  }

  test("bucket and rank match the bit-level reference") {
    val vals = (0 until 300).map(i => s"token-$i")
    val got = HllSketch.registers(
        vals.toDF("v").withColumn("g", lit(1)), Seq("g"), col("v"))
      .collect().map(r => (r.getAs[Int]("bucket"), r.getAs[Int]("r")))
      .toMap
    val expect = vals.map(ref).groupBy(_._1)
      .map { case (b, rs) => (b, rs.map(_._2).max) }
    assert(got === expect)
  }

  test("merge of shard sketches equals the sketch of the union") {
    val a = (0 until 4000).map(i => ("s", s"a-$i")).toDF("g", "v")
    val b = (0 until 4000).map(i => ("s", s"b-${i % 700}")).toDF("g", "v")
    val merged = HllSketch.merge(
      HllSketch.registers(a, Seq("g"), col("v")),
      HllSketch.registers(b, Seq("g"), col("v")), Seq("g"))
    val whole = HllSketch.registers(a.union(b), Seq("g"), col("v"))
    assert(merged.except(whole).count() === 0)
    assert(whole.except(merged).count() === 0)
  }

  test("rollup collapses keys to the sketch of the concatenated groups") {
    val df = (0 until 3000).map(i => (s"src${i % 5}", s"t-${i % 900}"))
      .toDF("g", "v")
    val rolled = HllSketch.rollup(HllSketch.registers(df, Seq("g"), col("v")))
    val direct = HllSketch.registers(
      df.withColumn("g", lit("all")), Seq("g"), col("v")).drop("g")
    assert(rolled.except(direct).count() === 0)
    assert(direct.except(rolled).count() === 0)
  }

  test("registers are partition-independent") {
    val df = (0 until 2000).map(i => ("g", s"x-$i")).toDF("g", "v")
    val one = HllSketch.registers(df.coalesce(1), Seq("g"), col("v"))
    val many = HllSketch.registers(df.repartition(13), Seq("g"), col("v"))
    assert(one.except(many).count() === 0)
    assert(many.except(one).count() === 0)
  }

  test("estimate is within 10% on 5000 distinct values") {
    val df = (0 until 20000).map(i => ("g", s"v-${i % 5000}")).toDF("g", "v")
    val est = HllSketch.estimate(
        HllSketch.registers(df, Seq("g"), col("v")), Seq("g"))
      .collect()(0).getAs[Double]("estimate")
    assert(math.abs(est - 5000) / 5000.0 < 0.10, s"estimate $est")
  }

  test("NULL values are skipped, empty input yields no registers") {
    val df = Seq(("g", "x"), ("g", null: String)).toDF("g", "v")
    assert(HllSketch.registers(df, Seq("g"), col("v")).count() === 1)
    assert(HllSketch.registers(df.where(lit(false)), Seq("g"),
      col("v")).count() === 0)
  }

  // The float estimator is deliberately outside the oracle gate; these
  // pinned vectors give it a non-oracle truth anchor. Each register
  // table is hand-built and the expected estimate is the closed form of
  // Flajolet et al. 2007 §4 evaluated by hand (m = 256,
  // alpha = 0.7213 / (1 + 1.079/m)), NOT re-derived from the code.
  test("estimator matches hand-computed closed forms on synthetic register tables") {
    def estOf(regs: Seq[(String, Int, Int)]): Double =
      HllSketch.estimate(regs.toDF("g", "bucket", "r"), Seq("g"))
        .collect()(0).getAs[Double]("estimate")

    // 32 of 256 buckets present: raw ≈ 196.1 ≤ 2.5m and nb < m, so the
    // linear-counting branch fires: 256·ln(256/224).
    val lc = estOf((0 until 32).map(b => ("g", b, 1)))
    assert(math.abs(lc - 34.18403651187778) < 1e-9, s"linear-counting $lc")

    // All 256 buckets rank 8: s = 256·2⁻⁸ = 1, estimate = α·m² exactly.
    val full = estOf((0 until 256).map(b => ("g", b, 8)))
    assert(math.abs(full - 47072.71267120224) < 1e-8, s"raw-branch $full")

    // All 256 buckets rank 1: raw = α·m²/128 ≈ 367.8 ≤ 2.5m BUT nb = m,
    // so linear counting must NOT fire (it would divide by zero).
    val sat = estOf((0 until 256).map(b => ("g", b, 1)))
    assert(math.abs(sat - 367.7555677437675) < 1e-9, s"saturated $sat")
  }

  test("key columns colliding with internal names are rejected") {
    val df = Seq((1, "x")).toDF("bucket", "v")
    intercept[IllegalArgumentException] {
      HllSketch.registers(df, Seq("bucket"), col("v"))
    }
    intercept[IllegalArgumentException] {
      HllSketch.estimate(df.toDF("r", "v"), Seq("r"))
    }
  }
}
