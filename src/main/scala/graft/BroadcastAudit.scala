package graft

import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}

/** Plan-level audit for the unbounded-broadcast hazard class found in
  * t42 (round 14): Spark's STATIC size estimate shrinks across
  * Aggregate nodes, so an aggregate over an exploded key domain (e.g.
  * distinct sliding-window keys — O(corpus), never broadcastable) can
  * be estimated under `autoBroadcastJoinThreshold` and statically
  * planned as a broadcast hash join. At the 100x corpus t42's
  * ~45 M-key build side then needed a ~1 GB hash array per task and
  * aborted with UNABLE_TO_ACQUIRE_MEMORY; on a real cluster the same
  * plan OOMs executors. AQE cannot always demote a statically-planned
  * broadcast, so these must not exist in the initial plan at all.
  *
  * This tool walks the INITIAL (pre-AQE) physical plan of every
  * `SparkEntry.queries` entry against a target corpus — explain only,
  * no job execution beyond what eager operators (classifier training,
  * artifact sizing counts) run while BUILDING their frame — and prints
  * one line per BroadcastExchange: the query, the build side's
  * estimated size, and whether the build subtree contains an
  * Aggregate-over-Generate (the t42 signature). Broadcasts of bounded
  * frames (dimension tables, committed artifacts, top-k results) are
  * the expected survivors; anything flagged `AGG_OVER_EXPLODE` whose
  * true cardinality grows with the corpus is a bug.
  *
  * Usage: runMain graft.BroadcastAudit [substring-filter]
  *   SPARK_GRAFT_SF_DIR  corpus dir (default target/scale100)
  */
object BroadcastAudit {

  private def hasAggOverExplode(p: SparkPlan): Boolean = {
    val isGen = (n: SparkPlan) => n.nodeName.toLowerCase.contains("generate")
    val isAgg = (n: SparkPlan) => n.nodeName.toLowerCase.contains("aggregate")
    p.collect { case n if isAgg(n) && n.collectLeaves().nonEmpty &&
      n.collect { case g if isGen(g) => g }.nonEmpty => n }.nonEmpty
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scale100")
    val filter = args.headOption.getOrElse("")
    val spark = graft.core.Sessions.local("graft-broadcast-audit")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(_.contains(filter))
    var flagged = 0
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        // sparkPlan = the statically-planned joins BEFORE EnsureRequirements
        // inserts exchanges and before AQE re-plans — exactly the static
        // broadcast decisions this audit is about.
        val plan = df.queryExecution.sparkPlan
        val builds: Seq[SparkPlan] = plan.collect {
          case b: BroadcastHashJoinExec =>
            if (b.buildSide == BuildLeft) b.left else b.right
          case b: BroadcastNestedLoopJoinExec =>
            if (b.buildSide == BuildLeft) b.left else b.right
        }
        builds.foreach { side =>
          val est = side.logicalLink
            .map(_.stats.sizeInBytes.toString).getOrElse("?")
          val sig = if (hasAggOverExplode(side)) "AGG_OVER_EXPLODE" else "ok"
          if (sig != "ok") flagged += 1
          val head = side.collect { case n => n.nodeName }.take(4)
          println(s"[audit] $name sig=$sig est=$est " +
            s"build=${head.mkString(" <- ")}")
        }
      } catch {
        case e: Exception =>
          println(s"[audit] $name BUILD_ERROR ${e.getClass.getSimpleName}")
      }
    }
    println(s"[audit] done: ${names.size} queries scanned, " +
      s"$flagged agg-over-explode broadcasts flagged")
    spark.stop()
  }
}
