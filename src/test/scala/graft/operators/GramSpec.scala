package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gram matrix: hand-computed closed form, agreement with an explode
  * reference on real embeddings, and partitioning independence. */
class GramSpec extends SparkSpec {
  import testImplicits._

  test("hand-computed 2-dim case via the documented quantization formula") {
    val vecs = Seq(
      Seq(0.5f, -0.25f),
      Seq(1.0f, 0.0000006f))
    val out = Gram.scaled(vecs.toDF("embedding"), "embedding", dims = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // q = floor(x·1e6 + 0.5) on the double-widened float — the same
    // arithmetic the oracle replays; 0.0000006f quantizes to 1
    val q = vecs.map(_.map(x => math.floor(x.toDouble * 1000000 + 0.5).toLong))
    assert(q(1)(1) === 1L)
    def cell(i: Int, j: Int) = q.map(v => v(i) * v(j)).sum
    assert(out === Map((0, 0) -> cell(0, 0), (0, 1) -> cell(0, 1), (1, 1) -> cell(1, 1)))
  }

  test("agrees with an explode-based reference on real sf0.001 embeddings") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Gram.scaled(embs, "embedding", dims = 64)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out.size === 64 * 65 / 2)
    // independent SQL-expression recomputation of two cells
    val d0 = embs.select(sum(
      floor(element_at(col("embedding"), 1).cast("double") * 1000000 + 0.5) *
        floor(element_at(col("embedding"), 1).cast("double") * 1000000 + 0.5))
      .cast("long")).head().getLong(0)
    assert(out((0, 0)) === d0)
    val d01 = embs.select(sum(
      floor(element_at(col("embedding"), 1).cast("double") * 1000000 + 0.5) *
        floor(element_at(col("embedding"), 2).cast("double") * 1000000 + 0.5))
      .cast("long")).head().getLong(0)
    assert(out((0, 1)) === d01)
  }

  test("partitioning-independent and null-safe") {
    val vecs = (0 until 200).map(i =>
      Seq.tabulate(4)(d => ((i * 7 + d * 3) % 11 - 5) / 7.0f))
    val a = Gram.scaled(vecs.toDF("embedding"), "embedding", dims = 4)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val b = Gram.scaled(vecs.toDF("embedding").repartition(13), "embedding", dims = 4)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(a === b)
    val withNull = vecs.toDF("embedding")
      .union(Seq(null.asInstanceOf[Seq[Float]]).toDF("embedding"))
    val c = Gram.scaled(withNull, "embedding", dims = 4)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(c === a, "null vectors are skipped")
  }
}
