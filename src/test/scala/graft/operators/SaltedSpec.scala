package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salting must change the DISTRIBUTION, never the ANSWER: salted
  * aggregation/join results equal the unsalted plans on a corpus where
  * one key holds ~90% of all rows. */
class SaltedSpec extends SparkSpec {
  import testImplicits._

  // hot key 7 carries 90k rows; 100 cold keys carry 100 each
  private def skewed = {
    val hot = spark.range(90000).select(lit(7L).as("k"), (col("id") % 1000).cast("double").as("v"))
    val cold = spark.range(10000).select((col("id") % 100 + 100).as("k"), col("id").cast("double").as("v"))
    hot.unionAll(cold)
  }

  test("salted aggregate equals the plain groupBy on skewed keys") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"),
        min("v").as("min_v"), max("v").as("max_v"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val salted = Salted.aggregate(skewed, Seq("k"), salt = 8,
      sums = Seq("v"), mins = Seq("v"), maxs = Seq("v"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(salted.keySet == plain.keySet)
    plain.foreach { case (k, (n, s, mn, mx)) =>
      val (n2, s2, mn2, mx2) = salted(k)
      assert(n2 == n, s"count for key $k")
      assert(math.abs(s2 - s) < 1e-6, s"sum for key $k")
      assert(mn2 == mn && mx2 == mx, s"min/max for key $k")
    }
  }

  test("salted join equals the plain join on a skewed fact side") {
    val dim = (Seq(7L) ++ (100L until 200L)).map(k => (k, s"name_$k"))
      .toDF("dk", "name")
    val plain = skewed.join(dim, col("k") === col("dk"))
      .groupBy("name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Salted.join(skewed, "k", dim, "dk", salt = 8)
      .groupBy("name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  // (tbl, bucket, id) rows with buckets of up to 6 members
  private def bucketRows = spark.range(200).select(
    (col("id") % 3).as("tbl"), (col("id") % 37).as("bucket"),
    col("id").as("doc_id"), (col("id") * 7 % 11).as("sig"))

  private def canonPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(least(col("left_id"), col("right_id")).as("a"),
        greatest(col("left_id"), col("right_id")).as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("SaltedSelfJoin gate: unsalted fast path answers exactly like forced salting") {
    // no bucket exceeds the default chunkSize → gate picks the plain join
    val gated = SaltedSelfJoin.pairs(bucketRows, Seq("tbl", "bucket"),
      "doc_id", payload = Seq("sig"))
    // chunkSize = 2 forces every bucket of 3+ through the chunk machinery
    val forced = SaltedSelfJoin.pairs(bucketRows, Seq("tbl", "bucket"),
      "doc_id", payload = Seq("sig"), chunkSize = 2)
    assert(canonPairs(gated) === canonPairs(forced),
      "gated and salted paths must enumerate the same candidate pairs")
    assert(canonPairs(gated).nonEmpty)
    // the fast path must carry none of the chunk machinery
    val plan = gated.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__m") && !plan.contains("__i"),
      s"gate failed to elide the chunk columns:\n$plan")
    // payload columns survive on both paths
    assert(gated.columns.toSet === forced.columns.toSet)
  }

  test("SaltedSelfJoin honors maxBucketHint without running the gate job") {
    val salted = SaltedSelfJoin.pairs(bucketRows, Seq("tbl", "bucket"),
      "doc_id", maxBucketHint = Some(100000L))
    assert(salted.queryExecution.optimizedPlan.toString.contains("__m"),
      "an oversized hint must force the chunk machinery")
    val plain = SaltedSelfJoin.pairs(bucketRows, Seq("tbl", "bucket"),
      "doc_id", chunkSize = 2, maxBucketHint = Some(2L))
    assert(!plain.queryExecution.optimizedPlan.toString.contains("__m"),
      "a within-bound hint must skip the chunk machinery")
    assert(canonPairs(salted) === canonPairs(plain))
  }

  test("phase-1 salted groups actually split the hot key") {
    val phase1Groups = skewed.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(8L)))
      .filter(col("k") === 7L)
      .select("__salt").distinct().count()
    assert(phase1Groups > 1, "hot key must spread over multiple salt groups")
  }
}
