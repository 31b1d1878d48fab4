package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Window-count and coverage truth table for the context chunker. */
class ChunkerSpec extends SparkSpec {
  import testImplicits._

  private def toksOf(n: Int): String = (0 until n).map(i => s"t$i").mkString(" ")

  private def run(text: String, size: Int = 8, stride: Int = 6): Seq[Row] =
    Seq((1L, text)).toDF("doc_id", "text")
      .transform(Chunker.chunk(_, "doc_id", "text", size, stride))
      .orderBy("chunk_idx").collect().toSeq

  test("blank and NULL text emit zero windows") {
    val rows = Seq((1L, ""), (2L, "   "), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .transform(Chunker.chunk(_, "doc_id", "text", 8, 6))
      .collect()
    assert(rows.isEmpty)
  }

  test("short document is one whole window") {
    val rows = run(toksOf(5))
    assert(rows.map(r => (r.getAs[Int]("chunk_idx"), r.getAs[Long]("n_tokens"),
      r.getAs[String]("chunk_text"))) === Seq((0, 5L, toksOf(5))))
  }

  test("exactly size tokens is one window; size+1 is two") {
    assert(run(toksOf(8)).size === 1)
    val two = run(toksOf(9))
    assert(two.size === 2)
    // second window starts at stride, covers the novel tail
    assert(two(1).getAs[Long]("start_tok") === 6L)
    assert(two(1).getAs[Long]("n_tokens") === 3L)
    assert(two(1).getAs[String]("chunk_text") === "t6 t7 t8")
  }

  test("windows overlap by size - stride and cover every token") {
    val n = 50
    val rows = run(toksOf(n))
    // k = ceil((50-8)/6)+1 = 8
    assert(rows.size === 8)
    rows.foreach { r =>
      assert(r.getAs[Long]("start_tok") === r.getAs[Int]("chunk_idx") * 6L)
    }
    val covered = rows.flatMap(_.getAs[String]("chunk_text").split(" ")).toSet
    assert(covered === (0 until n).map(i => s"t$i").toSet)
    // full interior windows are exactly `size` tokens
    assert(rows.init.forall(_.getAs[Long]("n_tokens") === 8L))
    // last window: starts at 42, covers 42..49
    assert(rows.last.getAs[Long]("n_tokens") === 8L)
  }

  test("stride == size tiles without overlap") {
    val rows = run(toksOf(20), size = 8, stride = 8)
    assert(rows.map(_.getAs[Long]("n_tokens")) === Seq(8L, 8L, 4L))
  }

  test("stride > size is refused") {
    intercept[IllegalArgumentException] {
      Chunker.chunk(Seq((1L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", size = 4, stride = 5)
    }
  }

  test("chunking is a pure scan-stage row-map (no shuffle)") {
    val plan = Seq((1L, toksOf(30))).toDF("doc_id", "text")
      .transform(Chunker.chunk(_, "doc_id", "text", 8, 6))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
