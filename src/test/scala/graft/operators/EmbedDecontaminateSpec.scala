package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-geometry behavior of the embedding decontamination flag. */
class EmbedDecontaminateSpec extends SparkSpec {
  import testImplicits._

  private val dims = 8
  private def vec(axis: Int, mag: Float) =
    Array.tabulate(dims)(d => if (d == axis) mag else 0f)

  test("near-copies of benchmark vectors are flagged; orthogonal ones are not") {
    val bench = Seq((0L, vec(0, 1f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, vec(0, 5f)),                 // parallel: cosine 1.0 -> flagged
      (11L, vec(1, 1f)),                 // orthogonal: cosine 0 -> clean
      (12L, Array.tabulate(dims)(d => if (d <= 1) 1f else 0f)) // 45 deg
    ).toDF("vec_id", "embedding")
    val out = EmbedDecontaminate.flag(corpus, bench, "vec_id", "embedding", 0.95)
      .orderBy("vec_id").collect()
    assert(out(0).getAs[Boolean]("contaminated"))
    assert(out(0).getAs[Double]("max_benchmark_sim") == 1.0)
    assert(!out(1).getAs[Boolean]("contaminated"))
    assert(out(1).getAs[Double]("max_benchmark_sim") == 0.0)
    assert(!out(2).getAs[Boolean]("contaminated"))
    assert(out(2).getAs[Double]("max_benchmark_sim") == 0.7071)
  }

  test("max is over the WHOLE benchmark set") {
    val bench = Seq((0L, vec(0, 1f)), (1L, vec(1, 1f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq((10L, vec(1, 3f))).toDF("vec_id", "embedding")
    val out = EmbedDecontaminate.flag(corpus, bench, "vec_id", "embedding", 0.95)
      .collect().head
    assert(out.getAs[Boolean]("contaminated")) // matches the SECOND bench row
  }

  test("empty benchmark set contaminates nothing and drops no rows") {
    val bench = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val corpus = Seq((10L, vec(0, 1f)), (11L, vec(1, 1f)))
      .toDF("vec_id", "embedding")
    val out = EmbedDecontaminate.flag(corpus, bench, "vec_id", "embedding", 0.95)
      .orderBy("vec_id").collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(!r.getAs[Boolean]("contaminated"))
      assert(r.getAs[Double]("max_benchmark_sim") == 0.0)
    }
  }
}
