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
}
