package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: the Morton value must interleave bits exactly, and
  * z-range buckets must bound BOTH dimensions (the property that makes
  * a z-sorted layout prune multi-dimensional scans). */
class LayoutSpec extends SparkSpec {
  import testImplicits._

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map(i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum

  test("zValue matches the bit-interleave reference on the full 16x16 grid") {
    val grid = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val out = grid.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    grid.foreach { case (x, y) =>
      assert(out((x, y)) === mortonRef(x, y, 4), s"($x, $y)")
    }
  }

  test("z-range buckets are 4x4 rectangles on a complete grid (both dims bounded)") {
    val grid = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val out = grid.toDF("x", "y")
      .select(col("x"), col("y"),
        shiftright(Layout.zValue(col("x"), col("y"), 4), 4).as("zbucket"))
      .groupBy(col("zbucket"))
      .agg(count(lit(1)).as("n"),
        (max(col("x")) - min(col("x"))).as("xspan"),
        (max(col("y")) - min(col("y"))).as("yspan"))
      .collect()
    assert(out.length === 16)
    out.foreach { r =>
      assert(r.getLong(1) === 16L, s"bucket ${r.getLong(0)} not 16 cells")
      assert(r.getLong(2) === 3L && r.getLong(3) === 3L,
        s"bucket ${r.getLong(0)} is not a 4x4 rectangle: " +
          s"xspan=${r.getLong(2)} yspan=${r.getLong(3)}")
    }
    // contrast: bucketing a PLAIN (x, y) sort key the same 16 ways
    // bounds only x — y spans the whole range
    val plain = grid.toDF("x", "y")
      .select(col("x"), col("y"),
        shiftright(col("x") * 16 + col("y"), 4).as("bucket"))
      .groupBy(col("bucket"))
      .agg((max(col("y")) - min(col("y"))).as("yspan"))
      .collect()
    assert(plain.forall(_.getLong(1) === 15L),
      "lexicographic layout must NOT bound the minor dimension")
  }

  test("out-of-range coordinates are masked, not corrupting high bits") {
    val out = Seq((1000L, -1L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 4).as("z")).head.getLong(0)
    assert(out === mortonRef(1000L & 15L, -1L & 15L, 4))
  }
}
