package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index: the k-means-centroid counterpart to
  * the random-hyperplane [[AnnIndex]] — together they are the two
  * standard scale paths for embedding search (SURVEY §2 "an IVF or
  * LSH-bucketed variant"). Vectors are clustered once; the index stores
  * each vector under its nearest centroid in the TABLE LAYOUT
  * (`partitionBy(cluster)`), so a query reads only its `nprobe` closest
  * centroid partitions instead of scanning the corpus — the IVF recall
  * knob is the probe count, not a hash width.
  *
  * Everything is deliberately deterministic so queries over a persisted
  * index are reproducible across runs, partition orders, and engines:
  *   - init = the k lowest-id vectors (no RNG);
  *   - Lloyd's iterations run a fixed count, with per-dimension means
  *     ROUNDED to `roundDp` decimals before use — partial-aggregation
  *     summation order perturbs raw doubles at ~1e-15, and rounding
  *     absorbs it (the same convention the oracle queries use);
  *   - assignment = argmax cosine with first-index tie-break.
  *
  * Scale shape: each Lloyd's iteration is one scan + one (cluster, dim)
  * aggregation shuffle; centroids ride as plan literals (k × dims
  * doubles — broadcast-sized by construction) and come back through a
  * [[graft.core.Bounded]] control-plane collect. No vector ever joins
  * against another vector during training; query-time scoring touches
  * only the probed partitions' rows. */
object IvfIndex {

  /** Nearest-centroid assignment as a Column: the native
    * [[graft.expr.CentroidArgmax]] kernel — max cosine, ties to the
    * lowest cluster id. Value-identical to the k-column
    * `array_position(sims, array_max(sims)) - 1` chain it replaces
    * (pinned by the t25/t28 goldens) but ONE static call per row: the
    * composed form inlined k cosine loops with k·dims literal doubles,
    * and Janino compile time dominated training on small corpora. */
  private[operators] def assignment(vec: Column, centroids: Seq[Seq[Double]]): Column =
    call_function("graft_argmax_cosine", vec,
      typedLit(centroids.flatten), lit(centroids.length))

  /** Per-row `nprobe`-nearest centroid ids (cosine desc, id asc) as a
    * Column — [[rankClusters]] distributed over a query SET, via the
    * native [[graft.expr.CentroidTopN]] kernel. This is the scan-stage
    * replacement for the crossJoin(centroid table) + row_number-window
    * probe ranking: that shape shuffles |queries|·k thin rows per probe
    * ranking (the window's partitionBy exchange), which at autoK-scale
    * cluster counts is a full extra exchange of the query corpus — the
    * kernel ranks in-place, ONE static call per row, no exchange at
    * all. Ranking semantics pinned to the same `ORDER BY sim DESC,
    * cluster` contract by CentroidTopNSpec's composed-chain parity. */
  private[operators] def probeRanking(vec: Column, centroids: Seq[Seq[Double]],
                                      nprobe: Int): Column =
    call_function("graft_topn_cosine", vec,
      typedLit(centroids.flatten), lit(centroids.length), lit(nprobe))

  /** Corpus-proportional cluster count — the published IVF/SemDeDup
    * regime (~n / targetClusterSize clusters; 50 k clusters at LAION
    * scale) as code instead of a comment: a fixed k = 16 keeps the
    * within-cluster quadratic term growing as (n/16)² while this keeps
    * per-cluster work constant as the corpus grows. The floor keeps
    * tiny corpora at the oracle-pinned default; the cap bounds the
    * centroid plan-literal (k × dims doubles must stay
    * broadcast-sized). Callers that need oracle determinism keep
    * passing a fixed k — auto-k is the production default, not a
    * semantics change. */
  def autoK(n: Long, targetClusterSize: Long = 4096,
            minK: Int = 16, maxK: Int = 65536): Int = {
    require(targetClusterSize >= 1 && minK >= 1 && maxK >= minK)
    math.min(maxK.toLong,
      math.max(minK.toLong,
        (n + targetClusterSize - 1) / targetClusterSize)).toInt
  }

  /** Train `k` centroids with `iters` Lloyd's iterations. Returns the
    * rounded centroids, cluster id = row index. */
  def train(df: DataFrame, idCol: String, vecCol: String, dims: Int,
            k: Int, iters: Int = 5, roundDp: Int = 4): Seq[Seq[Double]] = {
    require(k >= 1 && iters >= 1)
    // Lloyd's is iters+1 sequential actions over the same (id, vec)
    // projection; cache it so iterations re-read columnar blocks instead
    // of re-scanning the source (MEMORY_AND_DISK: spills, never recomputes
    // from a possibly-expensive upstream plan). Unpersisted on exit.
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try trainLoop(vecs, dims, k, iters, roundDp)
    finally vecs.unpersist(blocking = false)
  }

  private def trainLoop(vecs: DataFrame, dims: Int, k: Int, iters: Int,
                        roundDp: Int): Seq[Seq[Double]] = {

    // deterministic init: the k lowest-id vectors. The xxhash64(vec)
    // secondary sort makes the prefix well-defined even when id values
    // are NOT unique — without it, duplicate ids at the limit boundary
    // would make init (and thus the whole golden-oracled index)
    // engine/partition-order dependent.
    var centroids: Seq[Seq[Double]] = graft.core.Bounded.collect(
      vecs.orderBy(col("id"), xxhash64(col("vec"))).limit(k), k, "IvfIndex.init")
      .map(_.getAs[scala.collection.Seq[Float]]("vec").map(_.toDouble).toSeq)
      .toSeq
    require(centroids.length == k,
      s"IVF needs at least k=$k vectors, found ${centroids.length}")

    var i = 0
    while (i < iters) {
      // one scan: assign, then `dims` per-dimension sum aggregates + a
      // count, grouped by cluster — the shuffle carries k×(dims+1)
      // partial-sum cells, NOT n×dims exploded rows (the posexplode
      // formulation shipped one row per vector element per iteration,
      // which at corpus scale is a full-corpus-width shuffle every
      // Lloyd's round). The collect is control-plane: exactly k rows.
      val dimSums = (0 until dims).map(d =>
        sum(col("vec").getItem(d).cast("double")).as(s"s$d"))
      val rows = graft.core.Bounded.collect(
        vecs.select(assignment(col("vec"), centroids).as("cluster"), col("vec"))
          .groupBy(col("cluster"))
          .agg(count(lit(1)).as("cnt"), dimSums: _*),
        k, "IvfIndex.train")
      // rounded mean per dimension, driver-side: BigDecimal HALF_UP is
      // exactly Spark's round(), and `+ 0.0` normalizes -0.0 the same
      // way the oracled queries do
      val next = rows.map { r =>
        val cnt = r.getLong(1)
        r.getInt(0) -> (0 until dims).map { d =>
          java.math.BigDecimal.valueOf(r.getDouble(2 + d) / cnt)
            .setScale(roundDp, java.math.RoundingMode.HALF_UP)
            .doubleValue() + 0.0
        }
      }.toMap
      // a cluster that lost all members keeps its previous centroid —
      // deterministic, and standard Lloyd's practice
      centroids = centroids.indices.map(c => next.getOrElse(c, centroids(c)))
      i += 1
    }
    centroids
  }

  /** Build the persisted index: every vector under its nearest-centroid
    * partition, plus the centroid table itself for query-time probing. */
  def build(df: DataFrame, idCol: String, vecCol: String, dims: Int,
            path: String, k: Int, iters: Int = 5): Seq[Seq[Double]] = {
    val centroids = train(df, idCol, vecCol, dims, k, iters)
    df.select(col(idCol).as("id"), col(vecCol).as("vec"),
        assignment(col(vecCol), centroids).as("cluster"))
      .write.mode("overwrite").partitionBy("cluster").parquet(path)
    val spark = df.sparkSession
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cluster", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path.centroids")
    centroids
  }

  /** Driver-side nearest-`nprobe` centroid ranking for one query vector
    * (k cosines over doubles — control plane by construction). */
  private[operators] def rankClusters(centroids: Seq[(Int, Seq[Double])],
                           queryVec: Array[Float], nprobe: Int): Seq[Int] = {
    val q = queryVec.map(_.toDouble)
    val qn = math.sqrt(q.map(x => x * x).sum)
    centroids.map { case (id, c) =>
      val dot = q.indices.map(i => q(i) * c(i)).sum
      val d = qn * math.sqrt(c.map(x => x * x).sum)
      (if (d == 0) 0.0 else dot / d, id)
    }.sortBy { case (sim, id) => (-sim, id) }.take(nprobe).map(_._2)
  }

  /** The `nprobe` clusters nearest to the query vector, read from a
    * persisted index's centroid table. */
  def probeClusters(spark: SparkSession, path: String,
                    queryVec: Array[Float], nprobe: Int): Seq[Int] =
    rankClusters(
      graft.core.Bounded.collect(
        spark.read.parquet(s"$path.centroids"), 1 << 20, "IvfIndex.centroids")
        .map(r => r.getInt(0) -> r.getAs[scala.collection.Seq[Double]](1).toSeq)
        .toSeq,
      queryVec, nprobe)

  /** One-shot IVF top-k over an in-memory corpus (no persisted index):
    * train, probe the query's `nprobe` nearest clusters, score only
    * rows assigned to them. Same recall/pruning semantics as the
    * persisted path — the cluster filter trims the scan output instead
    * of directories — and fully deterministic, so it is oracle-able.
    * The query vector is selected from the corpus by `queryId`. */
  def scanTopK(df: DataFrame, idCol: String, vecCol: String, dims: Int,
               queryId: Long, k: Int, kClusters: Int = 16, iters: Int = 3,
               nprobe: Int = 2): DataFrame = {
    val centroids = train(df, idCol, vecCol, dims, kClusters, iters)
    val qvec = graft.core.Bounded.collect(
      df.filter(col(idCol) === queryId).select(col(vecCol)),
      1, "IvfIndex.queryVec")
      .head.getAs[scala.collection.Seq[Float]](0).toArray
    val probes = rankClusters(centroids.zipWithIndex.map(_.swap), qvec, nprobe)
    df.select(col(idCol), col(vecCol),
        assignment(col(vecCol), centroids).as("cluster"))
      .filter(col("cluster").isin(probes: _*))
      .filter(col(idCol) =!= queryId)
      .select(col(idCol),
        round(call_function("graft_cosine", col(vecCol),
          typedLit(qvec.toSeq)), 4).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)
  }

  /** Top-k by cosine over the `nprobe` probed partitions only —
    * partition pruning turns the filter into "read nprobe directories". */
  def topK(spark: SparkSession, path: String, queryVec: Array[Float],
           k: Int, nprobe: Int = 2, excludeId: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val probes = probeClusters(spark, path, queryVec, nprobe)
    val cand = spark.read.parquet(path)
      .filter(col("cluster").isin(probes: _*))
    val q = Seq(queryVec).toDF("__qvec")
    val scored = cand.join(broadcast(q))
      .select(col("id"),
        round(call_function("graft_cosine", col("vec"), col("__qvec")), 4)
          .as("cosine_sim"))
    excludeId.fold(scored)(id => scored.filter(col("id") =!= id))
      .orderBy(col("cosine_sim").desc, col("id"))
      .limit(k)
  }
}
