package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Baseline: brute-force cosine — one broadcast of the query vector(s),
  * a codegen'd per-row dot product, and a top-k. Scale path: random-
  * hyperplane LSH bucketing so only same-bucket candidates are scored —
  * the self-join shuffles on the bucket key instead of crossing n².
  * All arithmetic in double with sequential accumulation (index order),
  * so results are engine-reproducible.
  */
object Similarity {

  /** Dot product of two array columns, accumulated in double in index
    * order via the higher-order `aggregate` — no UDF, stays in codegen. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, 0.0).otherwise(dot(a, b) / d)
  }

  /** Brute-force cosine of every row against one query vector (selected
    * by id from the same table). The 1-row query side is broadcast; the
    * big side streams — no shuffle at all before the top-k. */
  def scoreAgainst(df: DataFrame, idCol: String, vecCol: String,
                   queryId: Long): DataFrame = {
    val q = df.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qvec"))
    df.join(broadcast(q))
      .select(col(idCol),
        round(cosine(col(vecCol), col("__qvec")), 4).as("cosine_sim"))
  }

  /** Top-k nearest by cosine, deterministic tiebreak on id. TakeOrdered
    * (sort+limit) keeps only k rows per partition — no global sort. */
  def topK(df: DataFrame, idCol: String, vecCol: String,
           queryId: Long, k: Int): DataFrame =
    scoreAgainst(df, idCol, vecCol, queryId)
      .filter(col(idCol) =!= queryId)
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)

  /** Random-hyperplane LSH signature: `bits` hyperplanes with components
    * derived deterministically from xxhash64(bit, dim) — centered to
    * ±[0.5, 1.5] via sign — vector → sign pattern packed in a Long.
    * Same-bucket vectors have high cosine with high probability. */
  def lshBucket(vec: Column, dims: Int, bits: Int = 12): Column = {
    val bitExprs = (0 until bits).map { b =>
      // pseudo-random hyperplane component for (b, i): map hash to ±1
      val proj = (0 until dims).map { i =>
        val sign = when((xxhash64(lit(b * 7919 + i)) % 2) === 0, 1.0).otherwise(-1.0)
        element_at(vec, i + 1).cast("double") * sign
      }.reduce(_ + _)
      when(proj > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }
    bitExprs.reduce((a, b) => a.bitwiseOR(b))
  }

  /** IVF-style bucketed ANN: score only candidates in the query's LSH
    * bucket. Trades recall for a bounded candidate set per bucket —
    * the 100 TB path (brute force is the correctness baseline). */
  def annTopK(df: DataFrame, idCol: String, vecCol: String, dims: Int,
              queryId: Long, k: Int, bits: Int = 8): DataFrame = {
    val bucketed = df.withColumn("__bucket", lshBucket(col(vecCol), dims, bits))
    val q = bucketed.filter(col(idCol) === queryId)
      .select(col("__bucket"), col(vecCol).as("__qvec"))
    bucketed.join(broadcast(q), Seq("__bucket"))
      .filter(col(idCol) =!= queryId)
      .select(col(idCol),
        round(cosine(col(vecCol), col("__qvec")), 4).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)
  }

  /** Embedding near-duplicate pairs: LSH-bucket self-join, keep pairs
    * with cosine above threshold. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String, dims: Int,
                   threshold: Double, bits: Int = 10): DataFrame = {
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", lshBucket(col("vec"), dims, bits))
    val l = bucketed.select(col("bucket"), col("id").as("left_id"), col("vec").as("left_vec"))
    val r = bucketed.select(col("bucket"), col("id").as("right_id"), col("vec").as("right_vec"))
    l.join(r, Seq("bucket"))
      .filter(col("left_id") < col("right_id"))
      .select(col("left_id"), col("right_id"),
        round(cosine(col("left_vec"), col("right_vec")), 4).as("cosine_sim"))
      .filter(col("cosine_sim") >= threshold)
      .distinct()
  }
}
