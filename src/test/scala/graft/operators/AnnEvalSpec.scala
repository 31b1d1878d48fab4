package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Recall semantics of the ANN evaluation harness on planted
  * geometries where the right answer is known by construction. */
class AnnEvalSpec extends SparkSpec {
  import testImplicits._

  private val dims = 8

  /** Two well-separated axis clusters of 30 vectors each, queries in
    * both: probing enough clusters must give perfect recall. */
  private def twoClusters = {
    val rows = (0 until 30).map { i =>
      (i.toLong, Array.tabulate(dims)(d =>
        if (d == 0) 10f else (i % 3) * 0.01f))
    } ++ (0 until 30).map { i =>
      (100L + i, Array.tabulate(dims)(d =>
        if (d == 1) 10f else (i % 3) * 0.01f))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("probing all clusters recovers exact top-k: recall 1.0 everywhere") {
    val out = AnnEval.ivfRecall(twoClusters, "vec_id", "embedding", dims,
        queryPred = col("vec_id") % 29 === 0, k = 5,
        kClusters = 2, iters = 2, nprobe = 2)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_hit") == 5L, s"query ${r.getLong(0)} missed")
      assert(r.getAs[Double]("recall") == 1.0)
    }
  }

  test("nprobe=1 on separated clusters still finds same-cluster neighbors") {
    // neighbors of an axis-0 query live in its own cluster: pruning to
    // one probe must not cost recall on this geometry
    val out = AnnEval.ivfRecall(twoClusters, "vec_id", "embedding", dims,
        queryPred = col("vec_id") === 0, k = 5,
        kClusters = 2, iters = 2, nprobe = 1)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("recall") == 1.0)
  }

  test("recall degrades when the probe misses a relevant cluster") {
    // query halfway between the two clusters: its true top-k straddles
    // both, so nprobe=1 must lose some of them (and the harness must
    // SAY so rather than report 1.0)
    val straddler = Seq((500L,
      Array.tabulate(dims)(d => if (d <= 1) 7f else 0f)))
      .toDF("vec_id", "embedding")
    val df = twoClusters.unionAll(straddler)
    val full = AnnEval.ivfRecall(df, "vec_id", "embedding", dims,
        queryPred = col("vec_id") === 500, k = 20,
        kClusters = 2, iters = 2, nprobe = 2).collect().head
    val pruned = AnnEval.ivfRecall(df, "vec_id", "embedding", dims,
        queryPred = col("vec_id") === 500, k = 20,
        kClusters = 2, iters = 2, nprobe = 1).collect().head
    assert(full.getAs[Double]("recall") == 1.0)
    assert(pruned.getAs[Double]("recall") < 1.0)
    assert(pruned.getAs[Long]("n_hit") < 20L)
  }

  test("plan shape: query set broadcasts, no cartesian product") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = AnnEval.ivfRecall(twoClusters, "vec_id", "embedding", dims,
      queryPred = col("vec_id") % 29 === 0, k = 5,
      kClusters = 2, iters = 2, nprobe = 2)
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val inner = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: QueryStageExec => walk(s.plan)
        case _ => Nil
      }
      p +: (inner ++ p.children.flatMap(walk))
    }
    val nodes = walk(df.queryExecution.executedPlan)
    val names = nodes.map(_.nodeName).toSet
    assert(!names.exists(_.contains("CartesianProduct")),
      s"corpus-vs-query scoring must broadcast, got: $names")
    assert(names.exists(n => n.contains("BroadcastNestedLoopJoin") ||
      n.contains("BroadcastHashJoin")),
      s"expected a broadcast join in: $names")
  }

  test("sampled panel: |Q| fixed, rows equal the full audit restricted " +
      "to the panel") {
    // the md5-ranked panel must (a) hold exactly numQueries rows no
    // matter the corpus size, (b) agree row-for-row with the exhaustive
    // audit on those qids — sampling changes WHICH queries run, never
    // what any query reports
    val numQ = 7
    val panel = twoClusters
      .select(col("vec_id"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(numQ).collect().map(_.getLong(0)).toSeq
    assert(panel.length == numQ)
    val sampled = AnnEval.ivfRecallSampled(twoClusters, "vec_id",
        "embedding", dims, numQueries = numQ, k = 5,
        kClusters = 2, iters = 2, nprobe = 2)
      .orderBy("qid").collect().toSeq
    assert(sampled.map(_.getLong(0)).sorted == panel.sorted,
      "panel must be the numQueries smallest md5(id) rows")
    val full = AnnEval.ivfRecall(twoClusters, "vec_id", "embedding", dims,
        queryPred = lit(true), k = 5, kClusters = 2, iters = 2, nprobe = 2)
      .filter(col("qid").isin(panel: _*))
      .orderBy("qid").collect().toSeq
    assert(sampled == full)
  }

  test("sampled panel is stable under corpus growth: old rows unchanged") {
    // grow the corpus; the panel may rotate members in/out by hash rank,
    // but |Q| stays fixed — the property that makes the audit linear
    val grown = twoClusters.unionAll(
      (0 until 40).map(i => (1000L + i,
        Array.tabulate(dims)(d => if (d == 2) 10f else i * 0.001f)))
        .toDF("vec_id", "embedding"))
    val out = AnnEval.ivfRecallSampled(grown, "vec_id", "embedding", dims,
        numQueries = 7, k = 5, kClusters = 3, iters = 2, nprobe = 3)
      .collect()
    assert(out.length == 7, "panel size must not grow with the corpus")
  }

  test("deterministic: repartitioned input gives identical recall rows") {
    val a = AnnEval.ivfRecall(twoClusters, "vec_id", "embedding", dims,
        queryPred = col("vec_id") % 7 === 0, k = 5,
        kClusters = 2, iters = 2, nprobe = 1)
      .orderBy("qid").collect().toSeq
    val b = AnnEval.ivfRecall(twoClusters.repartition(13), "vec_id",
        "embedding", dims,
        queryPred = col("vec_id") % 7 === 0, k = 5,
        kClusters = 2, iters = 2, nprobe = 1)
      .orderBy("qid").collect().toSeq
    assert(a == b)
  }
}
