package graft

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The seeded scale-up generator behind the PLANS.md scaling decades:
  * deterministic, distribution-preserving, and free of artificial
  * near-dup families (verbatim copies would hand the detectors a
  * quadratic answer that says nothing about scaling). */
class ScaleGenSpec extends SparkSpec {
  import testImplicits._

  private def docs = Seq(
    (0L, "alpha beta gamma delta epsilon", "en", "src0", 30L),
    (1L, "beta gamma delta zeta eta theta iota", "en", "src1", 37L),
    (2L, "gamma delta alpha beta kappa", "de", "src0", 28L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("scaleDocuments: factor x rows, fresh token draws from the same vocabulary") {
    val out = ScaleGen.scaleDocuments(spark, docs, 4).cache()
    assert(out.count() === 12)
    // copy 0 is the original rows verbatim
    assert(out.where(col("doc_id") < 1000000L).exceptAll(docs).isEmpty)
    // copies draw from the SAME vocabulary...
    val vocab = docs.select(explode(split(col("text"), " ")).as("w"))
      .distinct().collect().map(_.getString(0)).toSet
    val copyWords = out.where(col("doc_id") >= 10000000L)
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(copyWords.subsetOf(vocab))
    // ...with per-doc token counts preserved and texts NOT verbatim dups
    val lens = out.select(col("doc_id") % 10000000L,
        size(split(trim(col("text")), "\\s+")).as("n"))
      .groupBy(col("(doc_id % 10000000)")).agg(countDistinct(col("n")).as("d"))
      .collect()
    assert(lens.forall(_.getLong(1) === 1L), "token count drifted across copies")
    assert(out.select(col("text")).distinct().count() > 3,
      "copies must not be verbatim duplicates")
    // deterministic: same seed inputs, same output
    assert(ScaleGen.scaleDocuments(spark, docs, 4).exceptAll(out).isEmpty)
  }

  test("scaleEmbeddings: cyclic shift preserves norms and count") {
    val embs = Seq((0L, Array(1.0f, 2.0f, 3.0f, 4.0f), 1),
      (1L, Array(0.5f, 0.5f, -0.5f, -0.5f), 2)).toDF("vec_id", "embedding", "label")
    val out = ScaleGen.scaleEmbeddings(embs, 3).cache()
    assert(out.count() === 6)
    val norms = out.select(col("vec_id") % 10000000L,
        round(aggregate(col("embedding"), lit(0.0d),
          (a, x) => a + x * x), 6).as("n2"))
      .groupBy(col("(vec_id % 10000000)")).agg(countDistinct(col("n2")).as("d"))
      .collect()
    assert(norms.forall(_.getLong(1) === 1L), "cyclic shift changed a norm")
    // copy 1 of vec 0 is the literal rotation
    val r = out.where(col("vec_id") === 10000000L).head()
      .getAs[scala.collection.Seq[Float]]("embedding")
    assert(r.toSeq === Seq(2.0f, 3.0f, 4.0f, 1.0f))
  }

  test("scaleEvents: factor x users over the same time range") {
    val ev = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = ScaleGen.scaleEvents(ev, 5).cache()
    assert(out.count() === 5)
    assert(out.select(col("user_id")).distinct().count() === 5)
    assert(out.select(col("ts")).distinct().count() === 1, "time range must not grow")
    assert(out.select(col("event_id")).distinct().count() === 5)
  }
}
