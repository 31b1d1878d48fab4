package graft.operators

import graft.SparkSpec

/** Planted-boilerplate behavior of the corpus-wide line scrub. */
class LineScrubSpec extends SparkSpec {
  import testImplicits._

  private val boiler = "cookie notice: this site uses cookies"
  private val semi = "subscribe to our newsletter"

  // boiler in all 6 docs, semi in 4 (> maxDocFreq=3), uniques elsewhere
  private def corpus = Seq(
    (0L, s"$boiler\nunique zero\n\n$semi"),
    (1L, s"  $boiler  \nunique one"), // padded: trims to the same line
    (2L, s"$boiler\n$semi\nunique two\nunique two"), // intra-doc repeat
    (3L, s"$boiler\n$semi"),
    (4L, s"$boiler\n$semi\n   \nunique four"), // whitespace-only line
    (5L, s"$boiler\nunique five")
  ).toDF("doc_id", "text")

  private def rows =
    LineScrub.scrub(corpus, "doc_id", "text", maxDocFreq = 3)
      .orderBy("doc_id").collect()

  test("lines above the doc-frequency threshold are dropped everywhere") {
    val texts = rows.map(_.getAs[String]("text")).toSeq
    assert(texts(0) === "unique zero\n") // blank separator survives
    assert(texts(1) === "unique one")
    assert(texts(3) === "") // all lines hot -> empty, doc survives
    assert(texts(5) === "unique five")
  }

  test("blank lines are structure: never counted, never dropped") {
    assert(rows(4).getAs[String]("text") === "\nunique four")
    assert(rows(4).getAs[Long]("n_lines") === 3L)
    assert(rows(4).getAs[Long]("n_kept") === 1L)
  }

  test("intra-document repetition is not cross-doc boilerplate") {
    // "unique two" twice in ONE doc: df=1, both occurrences kept
    assert(rows(2).getAs[String]("text") === "unique two\nunique two")
    assert(rows(2).getAs[Long]("n_lines") === 4L)
    assert(rows(2).getAs[Long]("n_kept") === 2L)
  }

  test("matching and output use the trimmed line") {
    assert(rows(1).getAs[Long]("n_lines") === 2L)
    assert(rows(1).getAs[Long]("n_kept") === 1L)
  }

  test("at exactly maxDocFreq documents a line is kept") {
    val out = LineScrub.scrub(corpus, "doc_id", "text", maxDocFreq = 4)
      .orderBy("doc_id").collect()
    // semi: 4 docs = threshold -> kept; boiler: 6 docs > 4 -> dropped
    assert(out(3).getAs[String]("text") === semi)
    assert(out(3).getAs[Long]("n_kept") === 1L)
  }

  test("NULL and empty text survive as empty documents") {
    val edge = Seq((0L, null: String), (1L, ""), (2L, "solo line"))
      .toDF("doc_id", "text")
    val out = LineScrub.scrub(edge, "doc_id", "text", maxDocFreq = 1)
      .orderBy("doc_id").collect()
    assert(out.length === 3)
    assert(out(0).getAs[String]("text") === "")
    assert(out(0).getAs[Long]("n_lines") === 0L)
    assert(out(1).getAs[String]("text") === "")
    assert(out(2).getAs[String]("text") === "solo line")
    assert(out(2).getAs[Long]("n_kept") === 1L)
  }
}
