package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-style persisted ANN index — the true-scale path that
  * [[Similarity.annTopK]]'s scan-side bucketing only approximates: at
  * 100 TB the LSH bucket must live in the TABLE LAYOUT, so a query
  * reads only its probe buckets' files instead of scanning the corpus.
  *
  * Build: assign each vector its multi-table LSH buckets, explode, and
  * write parquet PARTITIONED BY (tbl, bucket). Query: compute the probe
  * set for the query vector driver-side, filter on the partition
  * columns — Catalyst partition pruning turns that into "read k
  * directories", verified by the spec via the scan's partition filters.
  * Recall characteristics are identical to the scan-side ANN (same
  * hyperplanes, same tables). */
object AnnIndex {

  /** Write the index: one row per (vector × table), partitioned so each
    * (tbl, bucket) pair is its own directory of files. */
  def build(df: DataFrame, idCol: String, vecCol: String, dims: Int,
      path: String, bits: Int = 6, tables: Int = 4): Unit =
    df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      explode(Similarity.lshBuckets(col(vecCol), dims, bits, tables)).as("tb"))
      .select(col("id"), col("vec"),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
      .write.mode("overwrite")
      .partitionBy("tbl", "bucket")
      .parquet(path)

  /** The candidate set for a query vector: only the probe partitions are
    * read (one per table; × the Hamming-ball size under multi-probe).
    * `queryVec` is computed driver-side — it is one vector, not
    * data-plane. `probeHamming` expands each table's probe to every
    * bucket within that Hamming distance (see [[Similarity.annTopK]]);
    * expansion happens on the driver-side probe LIST, so partition
    * pruning still applies — a probe of a bucket directory that does not
    * exist is pruned to an empty scan for free. */
  def candidates(spark: SparkSession, path: String, queryVec: Array[Float],
      dims: Int, bits: Int = 6, tables: Int = 4,
      probeHamming: Int = 0): DataFrame = {
    import spark.implicits._
    // control-plane collect, contractually one (tbl, bucket) probe per
    // LSH table for the single query vector
    val exact: Seq[(Int, Long)] = graft.core.Bounded.collect(
      Seq(queryVec).toDF("vec")
        .select(explode(Similarity.lshBuckets(col("vec"), dims, bits, tables)).as("tb"))
        .select(col("tb.tbl"), col("tb.bucket")),
      tables, "AnnIndex.probes")
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    val probes =
      if (probeHamming <= 0) exact
      else exact.flatMap { case (t, b) =>
        Similarity.probeMasks(bits, probeHamming).map(m => (t, b ^ m))
      }.distinct
    val index = spark.read.parquet(path)
    // ONE scan with an IN-list partition filter per table (not a
    // probe-count-deep unionAll): pruning keeps only probe directories,
    // and probes of buckets that were never written prune to nothing
    val pred = probes.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (t, bs) =>
        col("tbl") === t && col("bucket").isin(bs.map(_._2): _*)
      }.reduce(_ || _)
    index.filter(pred)
      .select(col("id"), col("vec")).dropDuplicates("id")
  }

  /** Top-k by cosine over the pruned candidate set. */
  def topK(spark: SparkSession, path: String, queryVec: Array[Float],
      dims: Int, k: Int, bits: Int = 6, tables: Int = 4,
      excludeId: Option[Long] = None, probeHamming: Int = 0): DataFrame = {
    import spark.implicits._
    val cand = candidates(spark, path, queryVec, dims, bits, tables, probeHamming)
    val q = Seq(queryVec).toDF("__qvec")
    val scored = cand.join(broadcast(q))
      .select(col("id"),
        round(Similarity.cosine(col("vec"), col("__qvec")), 4).as("cosine_sim"))
    excludeId.fold(scored)(id => scored.filter(col("id") =!= id))
      .orderBy(col("cosine_sim").desc, col("id"))
      .limit(k)
  }
}
