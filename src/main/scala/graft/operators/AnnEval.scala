package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ANN index-quality evaluation: recall@k of the IVF probe path
  * against exact brute-force cosine top-k, over a SET of query points
  * — the audit every production vector index ships with (an index
  * whose recall silently degrades as the corpus drifts is worse than
  * no index, because nothing else will tell you). Complements the
  * index operators themselves (t25 IVF, t40 PQ, t12 LSH): those
  * answer queries, this one measures whether the pruning is costing
  * answers.
  *
  * Everything is deterministic and replayable: similarities are
  * rounded to 4 dp BEFORE ranking with an id tie-break (the t11/t25
  * convention — unrounded doubles would make the k-boundary
  * engine-dependent), training is [[IvfIndex.train]]'s deterministic
  * Lloyd's, and the oracle replays assignment, probing, both top-k
  * sets, and the hit count from the committed centroid artifact.
  *
  * Scale shape: ONE corpus scan serves both arms — the query set is
  * broadcast (it is sample-sized by construction), every corpus row is
  * scored against each query and assigned to its centroid in the same
  * scan-stage projection, and the only shuffles are the two
  * rank-within-query windows over (qid, id, sim)-thin rows — k·|Q|
  * rows survive each. No vector ever joins against another vector. */
object AnnEval {

  /** (qid, n_hit, recall) per query: how many of the exact cosine
    * top-`k` the IVF probe path recovered. Queries = corpus rows
    * matching `queryPred` (each excluded from its own neighbor sets).
    *
    * SCALE CONTRACT: a predicate that selects a fixed FRACTION of the
    * corpus (the `% 97` style) makes the audit quadratic — |Q| ∝ n and
    * every query scores the whole corpus, so scored pairs ∝ n². That is
    * fine at small SFs where the exhaustive audit is the point; at
    * unknown/large scale use [[ivfRecallSampled]], whose panel size is
    * FIXED as the corpus grows. */
  def ivfRecall(df: DataFrame, idCol: String, vecCol: String, dims: Int,
                queryPred: Column, k: Int, kClusters: Int = 16,
                iters: Int = 3, nprobe: Int = 2): DataFrame =
    recallAgainst(df, idCol, vecCol, dims,
      df.filter(queryPred).select(col(idCol).as("qid"), col(vecCol).as("qvec")),
      k, kClusters, iters, nprobe)

  /** [[ivfRecall]] over a FIXED-SIZE deterministic query panel: the
    * `numQueries` corpus rows ranked by md5 of the id rendered as a
    * string (id tie-break) — the t34/t103 hash convention, uncorrelated
    * with any id-ordered attribute and replayable verbatim in SQL. |Q|
    * stays `numQueries` as the corpus grows, so the audit's scored
    * pairs are LINEAR in n — the production posture for recurring
    * index-quality checks at 100 TB. The panel selection is a top-k by
    * hash (TakeOrdered — k rows per partition, no global sort). */
  def ivfRecallSampled(df: DataFrame, idCol: String, vecCol: String,
                       dims: Int, numQueries: Int, k: Int,
                       kClusters: Int = 16, iters: Int = 3,
                       nprobe: Int = 2): DataFrame =
    recallAgainst(df, idCol, vecCol, dims,
      df.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
        .orderBy(md5(col("qid").cast("string")), col("qid"))
        .limit(numQueries),
      k, kClusters, iters, nprobe)

  private def recallAgainst(df: DataFrame, idCol: String, vecCol: String,
                            dims: Int, querySet: DataFrame, k: Int,
                            kClusters: Int, iters: Int,
                            nprobe: Int): DataFrame = {
    val corpus = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val centroids = IvfIndex.train(corpus, "id", "vec", dims, kClusters, iters)
    val queries = broadcast(querySet)

    // per-query probe set: the nprobe nearest centroids by unrounded
    // cosine (id tie-break) — the native graft_topn_cosine kernel,
    // scan-stage, centroids as a plan literal. Same ranking as
    // IvfIndex's driver-side rankClusters distributed over the query
    // set; the crossJoin(centroid table) + row_number window it
    // replaces paid a window exchange over |Q|·k thin rows.
    val probes = broadcast(queries
      .select(col("qid"),
        explode(IvfIndex.probeRanking(col("qvec"), centroids, nprobe))
          .as("cluster")))

    // one scan: score every (corpus row, query) pair AND carry the
    // row's cluster assignment; both top-k arms derive from this frame
    val scored = corpus
      .select(col("id"), col("vec"),
        IvfIndex.assignment(col("vec"), centroids).as("cluster"))
      .join(queries, col("id") =!= col("qid"))
      .select(col("qid"), col("id"), col("cluster"),
        round(Similarity.cosine(col("vec"), col("qvec")), 4).as("sim"))
    val wRank = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("id"))
    val exact = scored
      .withColumn("rn", row_number().over(wRank))
      .where(col("rn") <= k).select(col("qid"), col("id"))
    val ivf = scored.join(probes, Seq("qid", "cluster"))
      .withColumn("rn", row_number().over(wRank))
      .where(col("rn") <= k)
      .select(col("qid").as("__ivf_qid"), col("id").as("__ivf_id"))

    exact.join(ivf,
        col("qid") === col("__ivf_qid") && col("id") === col("__ivf_id"),
        "left")
      .groupBy(col("qid"))
      .agg(count(col("__ivf_id")).as("n_hit"))
      .select(col("qid"), col("n_hit"),
        round(col("n_hit") / k.toDouble, 4).as("recall"))
  }
}
