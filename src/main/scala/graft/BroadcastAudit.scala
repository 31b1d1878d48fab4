package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
import org.apache.spark.sql.types.StructType

/** FAILING plan audit for the unbounded-broadcast hazard class found in
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
  * Round 14 shipped this as a report: one line per broadcast join
  * build side of every `SparkEntry.queries` initial (pre-AQE) plan,
  * with the t42 signature (Aggregate-over-Generate in the build
  * subtree) flagged — but clearing the 48 flagged builds was prose
  * judgment in PLANS.md. This round it is a CHECK: every flagged
  * build side is COUNTED at the target corpus (re-planned from its
  * logical link, so the count pays its own exchanges), the true
  * deserialized-relation size is modeled as
  * rows × (schema.defaultSize + 16 bytes of UnsafeRow + hash-slot
  * overhead), and the build FAILS when that exceeds the bound
  * (default 256 MB — 4× the engine's 64 MB broadcast threshold,
  * i.e. "the static estimate was not just off, it was off by the
  * margin that killed t42"). Exit 1 on any FAIL; exit 2 when the audit
  * is INCOMPLETE — a query failed to plan (BUILD_ERROR) or a flagged
  * build had no logical link to truth-count (UNLINKED) — so a broken
  * corpus/config cannot silently read as a green gate.
  *
  * Broadcasts of bounded frames (dimension tables, committed
  * artifacts, top-k results) are the expected survivors and are
  * reported est-only; only the t42 signature class pays a count.
  *
  * Usage: runMain graft.BroadcastAudit [substring-filter]
  *   SPARK_GRAFT_SF_DIR           corpus dir (default target/scale100)
  *   SPARK_GRAFT_BROADCAST_BOUND  FAIL bound in bytes (default 256 MB)
  */
object BroadcastAudit {

  /** One audited broadcast build side. `trueRows`/`trueBytes` are -1
    * for builds that did not pay a count (benign signature, or no
    * logical link to re-plan from). */
  final case class BuildReport(query: String, sig: String, est: String,
      trueRows: Long, trueBytes: Long, verdict: String, head: String) {
    def line: String =
      s"[audit] $query sig=$sig est=$est trueRows=$trueRows " +
        s"trueMB=${if (trueBytes < 0) "-" else (trueBytes / (1 << 20)).toString} " +
        s"verdict=$verdict build=$head"
  }

  /** The t42 signature: an Aggregate whose subtree contains a Generate
    * (explode) — the shape whose static size estimate collapses while
    * its true cardinality is O(corpus). */
  private[graft] def hasAggOverExplode(p: SparkPlan): Boolean = {
    val isGen = (n: SparkPlan) => n.nodeName.toLowerCase.contains("generate")
    val isAgg = (n: SparkPlan) => n.nodeName.toLowerCase.contains("aggregate")
    p.collect { case n if isAgg(n) &&
      n.collect { case g if isGen(g) => g }.nonEmpty => n }.nonEmpty
  }

  /** Deserialized broadcast-relation size model: every row is an
    * UnsafeRow of the schema's default width plus ~16 bytes of object
    * header + hash-slot overhead in the driver/executor hash relation.
    * Deliberately simple — the t42 failure was a 40× estimate-vs-truth
    * gap; a ±2× width model cannot mask that class. */
  private[graft] def deserializedBytes(rows: Long, schema: StructType): Long =
    rows * (schema.defaultSize.toLong + 16L)

  /** All statically-planned broadcast build sides of `df`'s initial
    * (pre-AQE, pre-EnsureRequirements) plan, truth-counted where the
    * t42 signature matches. Pure function of the plan + corpus so the
    * spec can plant a corpus-sized build and prove the FAIL fires. */
  def auditQuery(spark: SparkSession, name: String, df: DataFrame,
      boundBytes: Long): Seq[BuildReport] = {
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
    builds.map { side =>
      val est = side.logicalLink
        .map(_.stats.sizeInBytes.toString).getOrElse("?")
      val head = side.collect { case n => n.nodeName }.take(4).mkString(" <- ")
      val flagged = hasAggOverExplode(side)
      if (!flagged)
        BuildReport(name, "ok", est, -1L, -1L, "-", head)
      else side.logicalLink match {
        case None =>
          // no logical link to re-plan a correct count from (the raw
          // physical subtree is pre-EnsureRequirements — executing it
          // directly would count unmerged partials); surface loudly
          BuildReport(name, "AGG_OVER_EXPLODE", est, -1L, -1L, "UNLINKED", head)
        case Some(logical) =>
          val rows = org.apache.spark.sql.graftaudit.PlanCounter
            .countRows(spark, logical)
          val bytes = deserializedBytes(rows, side.schema)
          val verdict = if (bytes > boundBytes) "FAIL" else "PASS"
          BuildReport(name, "AGG_OVER_EXPLODE", est, rows, bytes, verdict, head)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scale100")
    val bound = sys.env.getOrElse("SPARK_GRAFT_BROADCAST_BOUND",
      (256L * 1024 * 1024).toString).toLong
    val filter = args.headOption.getOrElse("")
    val spark = graft.core.Sessions.local("graft-broadcast-audit")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(_.contains(filter))
    var flagged = 0
    var failed = 0
    // the two escape paths that previously exited 0 (r15 advice): a
    // query that throws during planning, and a flagged build with no
    // logicalLink to truth-count. Either one means the gate did NOT
    // audit what it claims to — distinct non-zero exit so a corpus or
    // config problem cannot silently turn the check green.
    var buildErrors = 0
    var unlinked = 0
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        auditQuery(spark, name, df, bound).foreach { r =>
          if (r.sig != "ok") flagged += 1
          if (r.verdict == "FAIL") failed += 1
          if (r.verdict == "UNLINKED") unlinked += 1
          println(r.line)
        }
      } catch {
        case e: Exception =>
          buildErrors += 1
          println(s"[audit] $name BUILD_ERROR ${e.getClass.getSimpleName}")
      }
    }
    val verdict =
      if (failed > 0) "FAIL"
      else if (buildErrors > 0 || unlinked > 0) "INCOMPLETE"
      else "PASS"
    println(s"[audit] done: ${names.size} queries scanned, $flagged " +
      s"agg-over-explode builds truth-counted, $failed over the " +
      s"${bound / (1 << 20)} MB bound, $buildErrors build errors, " +
      s"$unlinked unlinked flagged builds: $verdict")
    spark.stop()
    if (failed > 0) sys.exit(1)
    if (buildErrors > 0 || unlinked > 0) sys.exit(2)
  }
}
