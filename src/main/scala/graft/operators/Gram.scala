package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-exact scaled Gram matrix over an embedding corpus — the
  * kernel under PCA/whitening/covariance analytics of an embedding
  * table: S[i][j] = Σ_v q_i(v)·q_j(v) for i ≤ j, where
  * q_i = floor(x_i·scale + 0.5) (half-up fixed-point; float widening
  * to double is exact, so both engines quantize identical bits — the
  * t82/q29 discipline applied to float input).
  *
  * Why fixed-point: a float Gram sum is ORDER-DEPENDENT (partial
  * aggregation sums in partition order, an oracle sums in scan order —
  * the hashes would diverge at the last ulp); quantizing first makes
  * the sum a commutative integer reduction, bit-identical under any
  * partitioning, and the quantization error is the caller's explicit
  * scale choice rather than summation noise.
  *
  * Scale shape: this is the justified-`mapPartitions` pattern (the
  * multimodal-codec class): each task folds its rows into ONE bounded
  * dims·(dims+1)/2-cell accumulator — a 64-dim corpus shuffles 2,080
  * rows PER PARTITION regardless of corpus size, then one final
  * (i, j) sum collapses partials. No explode (a naive dims² explode
  * of a 100 TB corpus is 2,080× its row count), no driver-side data.
  * Overflow headroom: |q| ≤ scale for unit-normalized embeddings, so
  * cells stay < 9.2e18 up to ~9 M rows·scale²; shard-then-rollup
  * (t69/t70) or a decimal accumulator covers the rest. */
object Gram {

  /** (i, j, s) for 0 ≤ i ≤ j < dims. NULL vectors are skipped; a
    * vector of the wrong length — or a non-null vector containing a
    * NULL element — fails fast with a clear error (the boxed-element
    * deserialization below exists exactly so dirty data surfaces as
    * this message, not an opaque encoder NPE). */
  def scaled(embs: DataFrame, vecCol: String, dims: Int,
             scale: Long = 1000000L): DataFrame = {
    require(dims >= 1 && dims <= 4096, "gram: dims must be in [1, 4096]")
    val sess = embs.sparkSession
    import sess.implicits._
    val tri = dims * (dims + 1) / 2
    val partials = embs.select(col(vecCol)).where(col(vecCol).isNotNull)
      .as[Seq[java.lang.Float]]
      .mapPartitions { it =>
        val acc = new Array[Long](tri)
        var any = false
        val q = new Array[Long](dims)
        it.foreach { v =>
          require(v.length == dims, s"gram: expected $dims dims, got ${v.length}")
          var i = 0
          while (i < dims) {
            val x = v(i)
            require(x ne null,
              s"gram: NULL element at index $i of a non-null embedding " +
                "vector (whole-NULL vectors are skipped; elements must be null-free)")
            q(i) = math.floor(x.floatValue.toDouble * scale + 0.5).toLong
            i += 1
          }
          var k = 0
          i = 0
          while (i < dims) {
            var j = i
            while (j < dims) { acc(k) += q(i) * q(j); j += 1; k += 1 }
            i += 1
          }
          any = true
        }
        if (!any) Iterator.empty
        else {
          val out = new Array[(Int, Int, Long)](tri)
          var k = 0
          var i = 0
          while (i < dims) {
            var j = i
            while (j < dims) { out(k) = (i, j, acc(k)); j += 1; k += 1 }
            i += 1
          }
          out.iterator
        }
      }
      .toDF("i", "j", "s")
    partials.groupBy(col("i"), col("j")).agg(sum(col("s")).as("s"))
  }
}
