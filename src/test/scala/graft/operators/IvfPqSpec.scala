package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF-PQ composition: full-probe equivalence with pure PQ, probe
  * pruning semantics, planted-near-dup retrieval, partitioning
  * independence, and the no-join plan shape. */
class IvfPqSpec extends SparkSpec {
  import testImplicits._

  private val dims = 16

  /** Same deterministic LCG corpus as PqIndexSpec: 200 vectors in
    * [0,1)^16 plus a planted near-copy of vector 7 at id 900. */
  private lazy val corpus = {
    def vec(id: Long): Seq[Float] =
      (0 until dims).map(d => (((id * 6364136223846793005L + d * 1442695040888963407L)
        >>> 33) % 1000) / 1000.0f)
    val base = (0L until 200L).map(id => (id, vec(id)))
    val planted = (900L, vec(7L).updated(0, vec(7L).head + 0.01f))
    (base :+ planted).toDF("vec_id", "embedding")
  }

  test("probing every cluster degenerates to pure PQ (same rows, same scores)") {
    val full = IvfPq.scanTopK(corpus, "vec_id", "embedding", dims,
      queryId = 7L, k = 10, kClusters = 4, nprobe = 4, m = 4, kCodes = 8)
      .collect().toSeq
    val pq = PqIndex.scanTopK(corpus, "vec_id", "embedding", dims,
      queryId = 7L, k = 10, m = 4, kCodes = 8)
      .collect().toSeq
    assert(full === pq)
  }

  test("planted near-copy of the query is the exact-L2 top result") {
    val top = IvfPq.scanTopK(corpus, "vec_id", "embedding", dims,
      queryId = 7L, k = 5, kClusters = 4, nprobe = 2, m = 4, kCodes = 8)
      .collect()
    assert(top.head.getLong(0) === 900L,
      "the near-copy must land in the query's probed cell and win re-rank")
  }

  test("pruned probes only ever surface rows assigned to probed cells") {
    val centroids = IvfIndex.train(corpus, "vec_id", "embedding", dims,
      k = 4, iters = 3)
    val qvec = corpus.filter(col("vec_id") === 7L)
      .collect().head.getAs[scala.collection.Seq[Float]](1).toArray
    val probes = IvfIndex.rankClusters(
      centroids.zipWithIndex.map(_.swap), qvec, nprobe = 2).toSet
    val assigned = corpus.select(col("vec_id"),
        IvfIndex.assignment(col("embedding"), centroids).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = IvfPq.scanTopK(corpus, "vec_id", "embedding", dims,
      queryId = 7L, k = 10, kClusters = 4, nprobe = 2, m = 4, kCodes = 8)
      .collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(probes.contains(assigned(r.getLong(0)))))
  }

  test("results are partitioning-independent") {
    def run(df: org.apache.spark.sql.DataFrame) =
      IvfPq.scanTopK(df, "vec_id", "embedding", dims,
        queryId = 7L, k = 10, kClusters = 4, nprobe = 2, m = 4, kCodes = 8)
        .collect().toSeq
    assert(run(corpus.repartition(7)) === run(corpus.coalesce(1)))
  }

  test("plan has no join: centroids, codebooks, ADC table ride as literals") {
    val df = IvfPq.scanTopK(corpus, "vec_id", "embedding", dims,
      queryId = 7L, k = 10, kClusters = 4, nprobe = 2, m = 4, kCodes = 8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }
}
