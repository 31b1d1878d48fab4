package graft.plans

import graft.SparkSpec
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mechanical guards for the physical-plan properties PLANS.md claims —
  * so a regression that, e.g., starts shuffling document text through a
  * dedup self-join fails CI instead of only showing up as a bench
  * slowdown. Plans are inspected AFTER execution (AQE-final). */
class PlanAuditSpec extends SparkSpec {
  import testImplicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def documents = spark.read.parquet(s"$sfDir/documents.parquet")
    .select(col("doc_id"), col("text"))
  private def embeddings = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def executedPlan(df: DataFrame): String = {
    df.count()
    df.queryExecution.executedPlan.toString
  }

  /** Argument lists of every shuffle exchange in the plan. */
  private def shuffleKeys(plan: String): Seq[String] =
    "hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(plan)
      .map(_.group(1)).toSeq

  test("minHashPairs: no text column rides any shuffle exchange") {
    val plan = executedPlan(Dedup.minHashPairs(documents, "text", "doc_id"))
    val offending = shuffleKeys(plan).filter(_.contains("text"))
    assert(offending.isEmpty,
      s"text in shuffle keys: $offending")
    // the only range/hash partitionings may carry ids, sigs, bands, words
    assert(!plan.contains("CartesianProduct"))
  }

  test("jaccardPairs: single aggregation pass for blocking, no text in exchanges") {
    val df = Dedup.jaccardPairs(documents, "text", "doc_id", threshold = 0.6)
    val plan = executedPlan(df)
    assert(shuffleKeys(plan).forall(k => !k.contains("text")),
      "document text must not be a shuffle key")
    assert(!plan.contains("CartesianProduct"))
  }

  test("containmentPairs: text never a shuffle key, no cartesian product") {
    val df = Dedup.containmentPairs(documents, "text", "doc_id")
    val plan = executedPlan(df)
    assert(shuffleKeys(plan).forall(k => !k.contains("text")),
      "document text must not be a shuffle key")
    assert(!plan.contains("CartesianProduct"))
  }

  test("IVF query: centroids are plan literals — no join, no shuffle before top-k") {
    val df = graft.operators.IvfIndex.scanTopK(
      embeddings, "vec_id", "embedding", dims = 64,
      queryId = 0L, k = 5, kClusters = 4, iters = 1, nprobe = 2)
    val plan = executedPlan(df)
    // assignment + probe filter + scoring all evaluate against literal
    // centroid/query vectors in the scan stage: the only plan shape is
    // scan → filter → TakeOrdered; any Join or Exchange would mean the
    // centroids leaked into a data-plane join
    assert(!plan.contains("Join"), s"unexpected join in IVF query:\n$plan")
    assert(shuffleKeys(plan).isEmpty, "IVF scoring must not shuffle")
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("simHash signature subplan is exchange-free (scan-stage computation)") {
    val plan = Dedup.simHash(documents, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected exchange:\n$plan")
  }

  test("brute-force cosine scoring plan has no shuffle before the top-k") {
    val scored = Similarity.scoreAgainst(embeddings, "vec_id", "embedding", 0L)
    val plan = executedPlan(scored)
    // one broadcast of the 1-row query side; zero hash shuffles
    assert(shuffleKeys(plan).isEmpty, s"unexpected shuffle: ${shuffleKeys(plan)}")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }

  test("exact dedup is a single hash-aggregate shuffle") {
    val plan = executedPlan(Dedup.exact(documents, "text", "doc_id"))
    assert(shuffleKeys(plan).size <= 1,
      s"expected at most one exchange, got: ${shuffleKeys(plan)}")
  }

  test("dimension join broadcasts the small side (no shuffle of the fact table)") {
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    val joined = customer.join(broadcast(nation),
      customer("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
    val plan = executedPlan(joined)
    assert(plan.contains("BroadcastHashJoin"))
    // the only shuffle is the final aggregation on n_name
    val keys = shuffleKeys(plan)
    assert(keys.forall(_.contains("n_name")), s"unexpected shuffles: $keys")
  }

  test("session_window aggregation is a single exchange on (user, window)") {
    val ev = Seq(("2024-03-15 12:00:00", 1L, 1.0), ("2024-03-15 12:20:00", 1L, 2.0))
      .toDF("ts_s", "user_id", "value")
      .select(to_timestamp(col("ts_s")).as("ts"), col("user_id"), col("value"))
    val plan = executedPlan(
      graft.streaming.Sessionize.sessions(ev, "ts", "user_id", "value"))
    assert(shuffleKeys(plan).size <= 1,
      s"expected one session exchange, got: ${shuffleKeys(plan)}")
  }

  test("per-position vector aggregation runs partial averages map-side") {
    val agg = embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("v").cast("double")))
    val plan = executedPlan(agg.toDF())
    assert(plan.contains("partial_avg"),
      "posexplode aggregation must partial-aggregate before the exchange")
  }

  test("SemDedup: vectors never key a shuffle; self-join is cluster-equi") {
    val df = graft.operators.SemDedup.prune(embeddings, "vec_id", "embedding",
      dims = 64, threshold = 0.9, kClusters = 4, iters = 1)
    val plan = executedPlan(df)
    assert(!plan.contains("CartesianProduct"))
    // the scale contract: embeddings may RIDE the cluster partition but
    // must never BE a partitioning key (a vector-keyed shuffle would
    // hash 256-byte arrays corpus-wide)
    val offending = shuffleKeys(plan).filter(k =>
      k.contains("embedding") || k.contains("vec#") || k.contains("prev_vec"))
    assert(offending.isEmpty, s"vector in shuffle keys: $offending")
    // assignment is scan-stage: no exchange may sit BELOW the cluster
    // repartition (centroids are literals, not a joined table)
    assert(plan.contains("REPARTITION_BY_COL"),
      "cluster repartition missing — self-join sides would each re-plan")
  }

  test("Packing: the only corpus shuffle is the per-stream window partition") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.operators.Packing.contextPack(docs, "doc_id", "text",
      "lang", ctxLen = 128, shards = 4)
    val keys = shuffleKeys(executedPlan(df))
    assert(keys.forall(k => k.contains("lang") && k.contains("shard")),
      s"unexpected shuffles: $keys")
    assert(keys.size <= 1, s"expected one window exchange, got: $keys")
  }

  test("Mixture: quota side broadcasts; corpus aggregated once, ranked once") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.operators.Mixture.temperatureSample(
      docs, "source", "text", "doc_id", total = 50)
    val plan = executedPlan(df)
    assert(plan.contains("BroadcastHashJoin"),
      "quota join must broadcast the strata-sized side")
    // exactly two source-keyed exchanges: the weight aggregation and the
    // rank window (the weight normalizer is a window over the tiny
    // weight table, NOT a second corpus aggregation)
    val corpusShuffles = shuffleKeys(plan).filter(_.contains("source"))
    assert(corpusShuffles.size <= 2,
      s"unexpected corpus shuffles: $corpusShuffles")
  }

  private def namedQuery(name: String): DataFrame =
    graft.queries.LlmQueries.all.find(_.name == name).get.fn(spark, sfDir)

  test("t34 hash split: pure projection — zero hash shuffles before the output sort") {
    val plan = executedPlan(namedQuery("t34_hash_split"))
    assert(shuffleKeys(plan).isEmpty,
      s"split assignment must not shuffle: ${shuffleKeys(plan)}")
  }

  test("t33 source cap: exactly one hash shuffle, keyed by source (the window)") {
    val plan = executedPlan(namedQuery("t33_source_cap"))
    val keys = shuffleKeys(plan)
    assert(keys.size == 1 && keys.head.contains("source"),
      s"expected one source-keyed window exchange, got: $keys")
    assert(keys.forall(k => !k.contains("text")),
      "document text must not be a shuffle key")
  }

  test("t32 per-doc repetition signals: pure scan-stage projection, zero hash shuffles") {
    // both signals moved into scan kernels (graft_dup_mass /
    // graft_rep_ratio): the plan must be a projection over the file
    // scan with no aggregation and no hash exchange — only the output
    // range sort remains
    val plan = executedPlan(namedQuery("t32_gopher_repetition"))
    assert(shuffleKeys(plan).isEmpty,
      s"t32 must not hash-shuffle: ${shuffleKeys(plan)}")
    assert(plan.contains("graft_dup_mass") && plan.contains("graft_rep_ratio"),
      "t32 must evaluate the native repetition kernels at the scan")
    assert(!plan.contains("HashAggregate"), "t32 must not aggregate")
  }

  test("t39 token profile: pure scan-stage projection, zero hash shuffles") {
    val plan = executedPlan(namedQuery("t39_word_entropy"))
    assert(shuffleKeys(plan).isEmpty,
      s"t39 must not hash-shuffle: ${shuffleKeys(plan)}")
    assert(plan.contains("graft_token_profile"),
      "t39 must evaluate the native profile kernel at the scan")
    assert(!plan.contains("HashAggregate"), "t39 must not aggregate")
  }

  test("t35 per-doc signals: text never a shuffle key, aggs are partial") {
    val plan = executedPlan(namedQuery("t35_hash_classifier"))
    assert(shuffleKeys(plan).forall(k => !k.contains("text")),
      "t35: document text must not be a shuffle key")
    assert(!plan.contains("CartesianProduct"), "t35")
    // token weights combine map-side before the exchange
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      "t35: expected map-side partial aggregation")
  }

  test("t36 bloom decontamination: sketch probe in-plan, text off shuffle keys") {
    val plan = executedPlan(namedQuery("t36_bloom_decontamination"))
    assert(plan.contains("graft_bloom_contains"),
      "prefilter must be the native sketch probe")
    assert(shuffleKeys(plan).forall(k => !k.contains("text")),
      "document text must not be a shuffle key")
    assert(!plan.contains("CartesianProduct"))
  }

  test("t42 duplicate spans: windows shuffle as md5 keys, never window text") {
    val plan = executedPlan(namedQuery("t42_duplicate_spans"))
    assert(shuffleKeys(plan).forall(k => !k.contains("text") && !k.contains("gram")),
      s"window text must not be a shuffle key: ${shuffleKeys(plan)}")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      "window counts must combine map-side")
  }

  /** Round-14 regression guard: the window-key joins in SpanDedup are
    * unbounded ⋈ unbounded (both sides O(corpus windows)) and carry
    * merge hints because Spark's STATIC size estimate shrinks through
    * the aggregations — at the 100× corpus it priced the ~45 M-row
    * distinct-window side under autoBroadcastJoinThreshold and planned
    * a broadcast whose ~1 GB-per-task hash relation aborted the query
    * (PLANS.md round 14). At this tiny SF a dropped hint would ALSO
    * plan a broadcast, so asserting the md5-key join is sort-merge
    * here catches the regression exactly where it would reappear. */
  test("t42/t46 span joins: the md5 window-key join must never be a broadcast") {
    Seq("t42_duplicate_spans", "t46_span_scrub").foreach { name =>
      val plan = executedPlan(namedQuery(name))
      val broadcastKeyJoins = plan.linesIterator
        .filter(_.contains("BroadcastHashJoin"))
        .filter(_.contains("[k#")).toSeq
      assert(broadcastKeyJoins.isEmpty,
        s"$name: window-key join planned as broadcast (unbounded build " +
          s"side — the round-14 100× abort): $broadcastKeyJoins")
      assert(plan.contains("SortMergeJoin"),
        s"$name: expected the hinted sort-merge window-key join")
    }
  }

  test("t44 token budget: the CORPUS window is (level, chunk)-partitioned; partition-less windows touch only the chunk-totals table") {
    val plan = executedPlan(namedQuery("t44_token_budget"))
    // a physical Window node prints `Window [exprs], [partitionSpec],
    // [orderSpec]` when partitioned and `Window [exprs], [orderSpec]`
    // when global — the bracket-group count distinguishes them (the
    // windowspecdefinition STRING cannot: order keys match too)
    val winLines = plan.linesIterator.map(_.trim)
      .filter(_.contains("Window [")).toSeq
    def bracketGroups(l: String): Seq[String] =
      l.substring(l.indexOf("Window [") + 7).split("\\], \\[").toSeq
    assert(winLines.nonEmpty, "expected the running-sum windows")
    // the corpus-side cumulative sum (over n_tokens) MUST have a
    // PARTITION spec containing both the quality level and the id
    // chunk — the hard 2^chunkBits per-task row bound; a window that
    // merely ORDERS by them would re-create the level-skew killer
    val corpusWins = winLines.filter(_.contains("n_tokens"))
    assert(corpusWins.nonEmpty, "expected the corpus running-sum window")
    corpusWins.foreach { l =>
      val groups = bracketGroups(l)
      assert(groups.length >= 3,
        s"corpus running sum lost its partition spec (global window!): $l")
      assert(groups(1).contains("quality") && groups(1).contains("chunk"),
        s"corpus running sum must PARTITION by (quality, chunk): $l")
    }
    // every other window (level/global offsets, the dense_rank guard)
    // may only aggregate the bounded chunk-totals table — neither
    // corpus text nor per-doc token counts may appear in them
    winLines.filterNot(corpusWins.contains).foreach { l =>
      assert(l.contains("ctot#") || l.contains("dense_rank"),
        s"window over unexpected columns (corpus leak?): $l")
      assert(!l.contains("text"),
        s"window over corpus text: $l")
    }
    // the offsets join must be a keyed join, never a cartesian (the
    // join STRATEGY is AQE's choice — broadcast at this scale, SMJ
    // reusing the window partitioning at larger ones; both are fine)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "offsets must join on (quality, chunk), not cross-join")
    // two corpus scans only: the totals pass and the final pass (the
    // split-subtree formulation measured FOUR un-reused parquet scans)
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans <= 2, s"expected <= 2 corpus scans, plan holds $scans")
  }

  test("t45 ccnet buckets: rank window partitions by language") {
    val plan = executedPlan(namedQuery("t45_ccnet_buckets"))
    val specs = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("lang#")),
      s"tercile rank must partition by lang:\n${specs.mkString("\n")}")
    assert(shuffleKeys(plan).forall(k => !k.contains("text")),
      "document text must not be a shuffle key")
  }

  test("t71 probe ranking is the native kernel — the crossJoin+window probe arm is gone") {
    val plan = executedPlan(namedQuery("t71_ivf_recall"))
    assert(plan.contains("graft_topn_cosine"),
      "probe ranking must go through the native CentroidTopN kernel")
    // exactly the two rank-within-query windows (exact arm + ivf arm)
    // survive; a third window would mean the probe ranking regressed to
    // the crossJoin(centroids) + row_number shape, which pays a window
    // exchange over |Q|·k rows per probe ranking
    val winLines = plan.linesIterator.count(_.trim.contains("Window ["))
    assert(winLines <= 2,
      s"expected only the two rank-within-query windows, found $winLines")
  }

  test("native expressions appear in generated code, not as interpreted fallbacks") {
    val df = embeddings.limit(10).select(
      Similarity.cosine(col("embedding"), col("embedding")).as("c"))
    val code = df.queryExecution.debug.codegenToSeq()
    assert(code.nonEmpty, "expected a WholeStageCodegen span")
    // a CodegenFallback would wrap the call in an `eval` on the expression
    // object; the real doGenCode inlines the fused loop with Math.sqrt
    assert(code.exists(_._2.contains("java.lang.Math.sqrt(")))
  }
}
