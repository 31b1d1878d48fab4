package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-template behavior of the paragraph-level near-dup scrub. */
class ParaDedupSpec extends SparkSpec {
  import testImplicits._

  private val disclaimer =
    "all rights reserved contact support for information about this site"
  private val bodies = Seq(
    "alpha document body with its own unique first paragraph text",
    "beta document body saying something entirely different here",
    "gamma document body on a third unrelated subject matter")

  // three docs, each body + the SAME disclaimer paragraph
  private def corpus = bodies.zipWithIndex.map { case (b, i) =>
    (i.toLong, s"$b\n\n$disclaimer")
  }.toDF("doc_id", "text")

  private def scrubbed = ParaDedup.scrub(corpus, "doc_id", "text")
    .orderBy("doc_id").collect()

  test("shared template paragraph: first occurrence kept, rest dropped") {
    val rows = scrubbed
    assert(rows.map(_.getAs[Long]("n_paras")).toSeq === Seq(2L, 2L, 2L))
    assert(rows.map(_.getAs[Long]("n_kept")).toSeq === Seq(2L, 1L, 1L))
    assert(rows(0).getAs[String]("clean_text") ===
      bodies(0) + "\n\n" + disclaimer)
    assert(rows(1).getAs[String]("clean_text") === bodies(1))
    assert(rows(2).getAs[String]("clean_text") === bodies(2))
  }

  test("near-variant paragraph (one token appended) is also dropped") {
    val df = Seq(
      (0L, s"${bodies(0)}\n\n$disclaimer"),
      (1L, s"${bodies(1)}\n\n$disclaimer graftdup")).toDF("doc_id", "text")
    val rows = ParaDedup.scrub(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(rows(1).getAs[Long]("n_kept") === 1L,
      "the near-variant disclaimer should near-dup the original")
    assert(rows(1).getAs[String]("clean_text") === bodies(1))
  }

  test("unrelated paragraphs are never conflated") {
    val rows = scrubbed
    assert(rows.map(_.getAs[Long]("n_kept")).sum === 4L) // 3 bodies + 1 disclaimer
  }

  test("paragraph order survives the scrub") {
    val df = Seq((0L, s"first para here now\n\n$disclaimer"),
      (1L, s"second doc body text\n\n$disclaimer\n\nclosing unique remark line"))
      .toDF("doc_id", "text")
    val rows = ParaDedup.scrub(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(rows(1).getAs[String]("clean_text") ===
      "second doc body text\n\nclosing unique remark line")
  }

  test("empty, blank, and NULL documents come back with 0/0/''") {
    val df = Seq((0L, ""), (1L, "   \n\n  "), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val rows = ParaDedup.scrub(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_paras") === 0L)
      assert(r.getAs[Long]("n_kept") === 0L)
      assert(r.getAs[String]("clean_text") === "")
    }
  }

  test("identical paragraphs WITHIN one document dedup too") {
    val df = Seq((0L, s"$disclaimer\n\nmiddle unique paragraph body\n\n$disclaimer"))
      .toDF("doc_id", "text")
    val r = ParaDedup.scrub(df, "doc_id", "text").collect().head
    assert(r.getAs[Long]("n_paras") === 3L)
    assert(r.getAs[Long]("n_kept") === 2L)
    assert(r.getAs[String]("clean_text") ===
      disclaimer + "\n\nmiddle unique paragraph body")
  }

  test("candidate volume is anchor-bounded (no pair explosion in plan)") {
    // 50 docs sharing one template: the bucket group collapses to ONE
    // anchor row, so the candidate join yields 8 bands x 49 rows, not
    // 50*49/2 pairs — assert output correctness as the observable proxy
    val df = (0 until 50).map(i =>
        (i.toLong, s"unique body number $i with distinct words\n\n$disclaimer"))
      .toDF("doc_id", "text")
    val rows = ParaDedup.scrub(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(rows.head.getAs[Long]("n_kept") === 2L)
    assert(rows.tail.forall(_.getAs[Long]("n_kept") === 1L))
  }
}
