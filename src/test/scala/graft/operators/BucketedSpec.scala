package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The co-located join contract: matching bucket layouts on both sides
  * must eliminate every shuffle from the join plan. */
class BucketedSpec extends SparkSpec {

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // finalize AQE
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeExec => 1
        case _ => 0
      }
      val inner = p match {
        case a: AdaptiveSparkPlanExec => count(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => count(s.plan)
        case _ => 0
      }
      self + inner + p.children.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }

  test("bucketed-by-key tables join with zero shuffles; unbucketed join shuffles") {
    // force sort-merge joins: the point is the exchange, and at this SF
    // the small side would otherwise broadcast (no shuffle either way)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try bucketedJoinBody() finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  private def bucketedJoinBody(): Unit = {
    val sfDir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")

    // baseline: plain parquet join needs exchanges on both sides
    val plain = lineitem.join(orders,
      lineitem("l_orderkey") === orders("o_orderkey"))
    assert(shuffleCount(plain) >= 2, "expected shuffles in the unbucketed join")

    // bucketed layout: same key, same bucket count on both sides
    Bucketed.writeBucketed(orders, "orders_b", "o_orderkey", 8)
    Bucketed.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", "o_orderkey", 8)
    val bucketed = Bucketed.table(spark, "lineitem_b")
      .join(Bucketed.table(spark, "orders_b"), Seq("o_orderkey"))
    assert(shuffleCount(bucketed) == 0,
      "bucketed join must be exchange-free")
    // and it returns the same rows as the plain join
    assert(bucketed.count() == plain.count())
  }
}
