package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Convergence, determinism, and scoring contract of the hashed-feature
  * logistic-regression trainer. */
class ClassifierSpec extends SparkSpec {
  import testImplicits._

  // linearly separable corpus: positives carry a marker token the
  // negatives never use (and vice versa), plus shared filler
  private def corpus = (0 until 20).flatMap { i =>
    Seq((i.toLong, "good", s"qualmark shared filler text number $i"),
      (100L + i, "junk", s"junkmark shared filler text number $i"))
  }.toDF("doc_id", "src", "text")

  test("separable corpus trains to perfect training accuracy") {
    val w = Classifier.train(corpus, "text", col("src") === "good",
      dims = 64, iters = 30, lr = 1.0)
    val scored = Classifier.score(corpus, "doc_id", "text", w, dims = 64)
      .join(corpus.select(col("doc_id"), col("src")), Seq("doc_id"))
    val wrong = scored.filter(
      (col("src") === "good") =!= (col("label") === "keep")).count()
    assert(wrong === 0, "separable training set not fit")
  }

  test("training is bit-deterministic across partitionings") {
    val w1 = Classifier.train(corpus.repartition(7), "text",
      col("src") === "good", dims = 64, iters = 10)
    val w2 = Classifier.train(corpus.coalesce(1), "text",
      col("src") === "good", dims = 64, iters = 10)
    assert(w1 === w2)
  }

  test("logistic loss decreases from the zero-weight start") {
    val w = Classifier.train(corpus, "text", col("src") === "good",
      dims = 64, iters = 30, lr = 1.0)
    def loss(weights: Seq[Double]): Double = {
      val m = Classifier.score(corpus, "doc_id", "text", weights, dims = 64)
        .join(corpus.select(col("doc_id"), col("src")), Seq("doc_id"))
        .select(col("margin"),
          when(col("src") === "good", 1.0).otherwise(-1.0).as("y"))
        .collect()
      m.map(r => math.log1p(math.exp(-r.getDouble(1) * r.getDouble(0))))
        .sum / m.length
    }
    val l0 = loss(Seq.fill(65)(0.0)) // = ln 2
    val lw = loss(w)
    assert(lw < l0, s"loss did not decrease: $lw >= $l0")
  }

  test("tokenless and NULL documents score the bias alone") {
    val w = Classifier.train(corpus, "text", col("src") === "good",
      dims = 64, iters = 5)
    val bias = BigDecimal(w(64)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      .toDouble + 0.0
    val scored = Classifier.score(
      Seq((1L, ""), (2L, "   "), (3L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"),
      "doc_id", "text", w, dims = 64).collect()
    scored.foreach(r => assert(r.getAs[Double]("margin") === bias))
  }

  test("scoring is a pure scan-stage row-map (no shuffle)") {
    val plan = Classifier.score(corpus, "doc_id", "text",
        Seq.fill(65)(0.1), dims = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("mini-batch at sample = 1 reproduces full-batch training bit-for-bit") {
    val full = Classifier.train(corpus, "text", col("src") === "good",
      dims = 64, iters = 10)
    val mb = Classifier.trainMiniBatch(corpus, "text",
      col("src") === "good", col("doc_id"), dims = 64, iters = 10,
      sample = 1)
    assert(mb === full)
  }

  test("mini-batch training is bit-deterministic across partitionings") {
    val w1 = Classifier.trainMiniBatch(corpus.repartition(7), "text",
      col("src") === "good", col("doc_id"), dims = 64, iters = 10,
      sample = 3)
    val w2 = Classifier.trainMiniBatch(corpus.coalesce(1), "text",
      col("src") === "good", col("doc_id"), dims = 64, iters = 10,
      sample = 3)
    assert(w1 === w2)
    // and the slices genuinely differ from full-batch: with a rotating
    // 1/3 selection the weight path must diverge from the full pass
    val full = Classifier.train(corpus, "text", col("src") === "good",
      dims = 64, iters = 10)
    assert(w1 !== full, "sampled training unexpectedly equals full-batch")
  }

  test("cache = false (per-iteration re-scan) trains bit-identical weights") {
    // the 100 TB posture: no persisted feature table, each iteration
    // re-scans the corpus for its slice — same weights to the last bit
    for (sample <- Seq(1, 3)) {
      val cached = Classifier.trainMiniBatch(corpus, "text",
        col("src") === "good", col("doc_id"), dims = 64, iters = 10,
        sample = sample, cache = true)
      val rescan = Classifier.trainMiniBatch(corpus.repartition(5), "text",
        col("src") === "good", col("doc_id"), dims = 64, iters = 10,
        sample = sample, cache = false)
      assert(rescan === cached, s"sample=$sample")
    }
  }

  test("mini-batch still fits the separable corpus") {
    val w = Classifier.trainMiniBatch(corpus, "text", col("src") === "good",
      col("doc_id"), dims = 64, iters = 45, lr = 1.0, sample = 3)
    val scored = Classifier.score(corpus, "doc_id", "text", w, dims = 64)
      .join(corpus.select(col("doc_id"), col("src")), Seq("doc_id"))
    val wrong = scored.filter(
      (col("src") === "good") =!= (col("label") === "keep")).count()
    assert(wrong === 0, "separable training set not fit by mini-batch")
  }

  test("an iteration with an empty slice leaves the weights unchanged") {
    // 1 doc, sample so large most iterations select nothing: training
    // must not crash or corrupt weights (division by zero slice)
    val one = Seq((42L, "good", "qualmark solo text")).toDF("doc_id", "src", "text")
    val w = Classifier.trainMiniBatch(one, "text", col("src") === "good",
      col("doc_id"), dims = 64, iters = 8, sample = 1000)
    assert(w.length === 65)
    assert(w.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("bucket matches the cross-engine md5 idiom") {
    // pin a couple of literals so an md5/conv regression can't hide
    val got = Seq("the", "spark").toDF("t")
      .select(Classifier.bucket(col("t"), 256).as("b"))
      .collect().map(_.getLong(0))
    def expected(s: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(4), 16) % 256
    }
    assert(got.toSeq === Seq(expected("the"), expected("spark")))
  }
}
