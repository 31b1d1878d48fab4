package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

import graft.operators.BpeTrain

/** BPE kernel against hand-computed tokenization vectors, rank-priority
  * and leftmost-occurrence semantics, trainer determinism on a known
  * corpus, and the trainer → kernel round trip. */
class BpeSpec extends SparkSpec {
  import testImplicits._

  private def ranks(merges: String*) =
    BpeKernel.buildRanks(merges.toArray)

  test("kernel: hand-computed vectors under merges [a b, ab c]") {
    val r = ranks("a b", "ab c")
    // abc: a,b,c -> ab,c -> abc
    assert(BpeKernel.wordCount("abc", r) == 1)
    // cab: c,a,b -> c,ab (c+ab not a merge)
    assert(BpeKernel.wordCount("cab", r) == 2)
    // aba: leftmost (a,b) fuses; trailing a survives
    assert(BpeKernel.wordCount("aba", r) == 2)
    // aabb: the only (a,b) adjacency is in the middle
    assert(BpeKernel.wordCount("aabb", r) == 3)
    // unseen characters never fuse
    assert(BpeKernel.wordCount("xyz", r) == 3)
  }

  test("kernel: rank priority beats textual position") {
    // (b,c) learned FIRST: in 'abc' it must fuse before (a,b) even
    // though (a,b) sits further left
    val r = ranks("b c", "a b")
    assert(BpeKernel.wordCount("abc", r) == 2) // a | bc
    // with the opposite rank order the same word fully fuses only if
    // (ab,c) were learned — it wasn't, so: ab | c
    assert(BpeKernel.wordCount("abc", ranks("a b", "b c")) == 2)
  }

  test("kernel: whitespace-word split and empty edge cases") {
    val r = ranks("a b")
    import org.apache.spark.unsafe.types.UTF8String
    assert(BpeKernel.count(UTF8String.fromString("ab ab  ab"), r) == 3L)
    assert(BpeKernel.count(UTF8String.fromString(""), r) == 0L)
    assert(BpeKernel.count(UTF8String.fromString("   "), r) == 0L)
    assert(BpeKernel.count(UTF8String.fromString("  ab  "), r) == 1L)
  }

  test("expression: codegen path equals kernel on a corpus sample") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    val merges = BpeTrain.train(docs, "text", numMerges = 30, maxVocab = 1024)
    val viaExpr = docs
      .select(col("doc_id"),
        call_function("graft_bpe_count", col("text"), typedLit(merges)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r = BpeKernel.buildRanks(merges.toArray)
    docs.select(col("doc_id"), col("text")).collect().foreach { row =>
      val expected = BpeKernel.count(
        org.apache.spark.unsafe.types.UTF8String.fromString(row.getString(1)), r)
      assert(viaExpr(row.getLong(0)) == expected,
        s"codegen/kernel mismatch on doc ${row.getLong(0)}")
    }
  }

  test("trainer: known corpus learns the expected merge and stops") {
    val docs = Seq("aa aa aa", "aa").toDF("text")
    // only word 'aa' (count 4): one (a,a) adjacency per occurrence ->
    // merge 'a a' learned, then no pairs remain
    assert(BpeTrain.train(docs, "text", numMerges = 10) == Seq("a a"))
  }

  test("trainer: singleton pairs are not learned (count < 2 stop)") {
    val docs = Seq("xy").toDF("text")
    assert(BpeTrain.train(docs, "text", numMerges = 10).isEmpty)
  }

  test("trainer: deterministic and partitioning-independent") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = BpeTrain.train(docs.repartition(1), "text", 50, 2048)
    val b = BpeTrain.train(docs.repartition(13), "text", 50, 2048)
    assert(a == b && a.nonEmpty)
  }

  test("tokenBudget accepts a BPE counter as its budget unit") {
    val docs = Seq(
      (1L, "ab ab ab ab"), // 4 whitespace tokens
      (2L, "cd cd")).toDF("doc_id", "text")
    val merges = Seq("a b")
    val out = graft.operators.Selection.tokenBudget(docs,
        budget = 1000000L,
        tokensOf = t => call_function("graft_bpe_count", t, typedLit(merges)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // doc 1: each 'ab' fuses to ONE token -> 4; doc 2: 'cd' stays two -> 4
    assert(out == Map(1L -> 4L, 2L -> 4L))
  }
}
