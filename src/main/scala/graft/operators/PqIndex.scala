package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-quantization ANN (Jégou et al. 2011): the compressed-domain
  * scale path next to [[IvfIndex]] (centroid pruning) and [[AnnIndex]]
  * (hyperplane LSH). The corpus is stored as `m` small codeword ids per
  * vector (m bytes-ish vs dims·4 — a 64-dim float vector compresses
  * 32×), and a query scores the WHOLE corpus with `m` table lookups per
  * row instead of `dims` multiplies — the memory-bandwidth-bound regime
  * where PQ wins at 100 TB: the codes table fits in a fraction of the
  * cache the raw vectors need, and the scan never touches the embedding
  * column. Exact re-ranking then touches only `k·refine` candidate
  * vectors.
  *
  * Deterministic by the same conventions as [[IvfIndex]] (this repo's
  * requirement for golden-oracled queries): init = codewords from the k
  * lowest-id vectors (xxhash64 secondary sort), fixed Lloyd's iteration
  * count, per-dimension means rounded to `roundDp` before use,
  * first-index tie-breaks everywhere.
  *
  * Scale shape per training iteration: ONE corpus scan; the native
  * `graft_pq_encode` assigns all m subspaces in the scan stage;
  * `posexplode` emits (subspace, code, subvector) rows whose partial
  * aggregation collapses to m·k·(sub+1) cells before the shuffle; the
  * driver sees exactly m·k rows ([[graft.core.Bounded]]). Codebooks and
  * ADC tables ride as plan literals — nothing vector-sized is ever
  * collected or shuffled. */
object PqIndex {

  /** Codebooks flattened to the [[graft.expr.PqKernel]] layout:
    * `((j*k)+c)*sub + d`. */
  private def flat(cb: Seq[Seq[Seq[Double]]]): Seq[Double] =
    cb.flatten.flatten

  private[operators] def encodeCol(vec: Column, cb: Seq[Seq[Seq[Double]]],
                        m: Int, k: Int): Column =
    call_function("graft_pq_encode", vec, typedLit(flat(cb)), lit(m), lit(k))

  /** Train per-subspace codebooks: `m` × `k` × (dims/m) rounded doubles. */
  def train(df: DataFrame, idCol: String, vecCol: String, dims: Int,
            m: Int = 8, k: Int = 16, iters: Int = 3,
            roundDp: Int = 4): Seq[Seq[Seq[Double]]] = {
    require(m >= 1 && k >= 1 && iters >= 1, "pq: m, k, iters must be >= 1")
    require(dims % m == 0, s"pq: dims=$dims must divide into m=$m subspaces")
    val sub = dims / m
    // iters+1 sequential actions over the same projection — cache like
    // IvfIndex.train (MEMORY_AND_DISK, unpersisted on exit)
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try trainLoop(vecs, sub, m, k, iters, roundDp)
    finally vecs.unpersist(blocking = false)
  }

  private def trainLoop(vecs: DataFrame, sub: Int, m: Int, k: Int,
                        iters: Int, roundDp: Int): Seq[Seq[Seq[Double]]] = {
    // deterministic init: subspace j's codewords = slices of the k
    // lowest-id vectors (same well-defined prefix as IvfIndex.train)
    val init = graft.core.Bounded.collect(
      vecs.orderBy(col("id"), xxhash64(col("vec"))).limit(k), k, "PqIndex.init")
      .map(_.getAs[scala.collection.Seq[Float]]("vec").map(_.toDouble))
    require(init.length == k, s"PQ needs at least k=$k vectors, found ${init.length}")
    var codebooks: Seq[Seq[Seq[Double]]] =
      (0 until m).map(j => init.map(v => v.slice(j * sub, (j + 1) * sub).toSeq).toSeq)

    var it = 0
    while (it < iters) {
      val dimSums = (0 until sub).map(d =>
        sum(col("sv").getItem(d).cast("double")).as(s"s$d"))
      val rows = graft.core.Bounded.collect(
        vecs.select(col("vec"),
            posexplode(encodeCol(col("vec"), codebooks, m, k))
              .as(Seq("j", "code")))
          .select(col("j"), col("code"),
            slice(col("vec"), col("j") * sub + 1, lit(sub)).as("sv"))
          .groupBy(col("j"), col("code"))
          .agg(count(lit(1)).as("cnt"), dimSums: _*),
        m * k, "PqIndex.train")
      val next = rows.map { r =>
        val cnt = r.getLong(2)
        (r.getInt(0), r.getInt(1)) -> (0 until sub).map { d =>
          java.math.BigDecimal.valueOf(r.getDouble(3 + d) / cnt)
            .setScale(roundDp, java.math.RoundingMode.HALF_UP)
            .doubleValue() + 0.0
        }
      }.toMap
      // a codeword that lost all members keeps its previous value
      codebooks = codebooks.zipWithIndex.map { case (cw, j) =>
        cw.zipWithIndex.map { case (old, c) => next.getOrElse((j, c), old) }
      }
      it += 1
    }
    codebooks
  }

  /** The per-query ADC table: table[j·k + c] = ‖q_j − codeword_{j,c}‖²,
    * driver-computed (m·k·sub multiplies — control plane). */
  private[operators] def adcTable(q: Array[Double], cb: Seq[Seq[Seq[Double]]],
                                  k: Int): Seq[Double] = {
    val sub = q.length / cb.length
    cb.zipWithIndex.flatMap { case (cw, j) =>
      cw.map { c =>
        var s = 0.0
        var d = 0
        while (d < sub) {
          val diff = q(j * sub + d) - c(d)
          s += diff * diff
          d += 1
        }
        s
      }
    }
  }

  /** One-shot PQ top-k: train, encode the corpus in the scan stage,
    * ADC-score every row (m table lookups), take the `k·refine` best
    * candidates via TakeOrdered, then re-rank them by EXACT squared L2
    * against the query. Fully deterministic → golden-oracle-able. */
  def scanTopK(df: DataFrame, idCol: String, vecCol: String, dims: Int,
               queryId: Long, k: Int, m: Int = 8, kCodes: Int = 16,
               iters: Int = 3, refine: Int = 4): DataFrame = {
    require(refine >= 1, "pq: refine must be >= 1")
    val cb = train(df, idCol, vecCol, dims, m, kCodes, iters)
    val qvec = graft.core.Bounded.collect(
      df.filter(col(idCol) === queryId).select(col(vecCol)),
      1, "PqIndex.queryVec")
      .head.getAs[scala.collection.Seq[Float]](0).map(_.toDouble).toArray
    val table = adcTable(qvec, cb, kCodes)

    val approx = call_function("graft_pq_adc",
      encodeCol(col(vecCol), cb, m, kCodes), typedLit(table), lit(kCodes))
    // candidate cut on ROUNDED approx distance (id tiebreak): identical
    // codes → identical score, so determinism needs the explicit order
    val cand = df.select(col(idCol).as("vec_id"), col(vecCol).as("vec"),
        round(approx, 4).as("approx_l2sq"))
      .filter(col("vec_id") =!= queryId)
      .orderBy(col("approx_l2sq"), col("vec_id"))
      .limit(k * refine)
    // exact re-rank of k·refine rows: the interpreted HOF fold is fine
    // at candidate cardinality (sequential fold = deterministic order)
    val exact = aggregate(
      zip_with(col("vec"), typedLit(qvec.toSeq),
        (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    cand.select(col("vec_id"), col("approx_l2sq"),
        round(exact, 4).as("l2_sq"))
      .orderBy(col("l2_sq"), col("vec_id"))
      .limit(k)
  }
}
