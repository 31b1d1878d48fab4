package graft.expr

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.operators.{Dedup, PiiRedact, Similarity}
import org.apache.spark.sql.functions._

/** Value parity between the native codegen expressions (graft_cosine,
  * graft_lsh_buckets, graft_minhash_sig, graft_simhash) and the
  * composed-Column reference implementations they replaced on the hot
  * paths — plus hash-primitive parity with Spark's own xxhash64 and
  * degenerate-input semantics.
  *
  * Mismatch filters use null-safe `not(a <=> b)`, never `a =!= b`
  * (r16/r17 advice): `=!=` evaluates to NULL when either side is NULL,
  * the filter then DROPS the row, and a regression that nulls a native
  * kernel's output would sail through a zero-mismatch assertion. */
class NativeExpressionsSpec extends SparkSpec {
  import testImplicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def embeddings = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private def documents = spark.read.parquet(s"$sfDir/documents.parquet")

  test("graft_cosine is bit-identical to the composed cosine on real embeddings") {
    val q = embeddings.filter(col("vec_id") === 0L)
      .select(col("embedding").as("__q"))
    val mismatches = embeddings.join(broadcast(q))
      .select(
        Similarity.cosine(col("embedding"), col("__q")).as("native"),
        Similarity.cosineComposed(col("embedding"), col("__q")).as("composed"))
      .filter(not(col("native") <=> col("composed")))
      .count()
    assert(mismatches == 0)
  }

  test("graft_cosine degenerate inputs: zero vector -> 0.0, length mismatch and null element -> NULL") {
    val out = spark.sql(
      """SELECT graft_cosine(array(0.0F, 0.0F), array(1.0F, 2.0F)),
        |       graft_cosine(array(1.0F, 2.0F), array(1.0F, 2.0F, 3.0F)),
        |       graft_cosine(array(1.0F, CAST(NULL AS FLOAT)), array(1.0F, 2.0F)),
        |       graft_cosine(CAST(NULL AS ARRAY<FLOAT>), array(1.0F)),
        |       graft_cosine(array(1.0D, 2.0D), array(2.0D, 4.0D))""".stripMargin).head()
    assert(out.getDouble(0) == 0.0)
    assert(out.isNullAt(1))
    assert(out.isNullAt(2))
    assert(out.isNullAt(3))
    assert(math.abs(out.getDouble(4) - 1.0) < 1e-12) // double arrays supported
  }

  test("graft_cosine participates in whole-stage codegen") {
    val df = embeddings.limit(5).select(
      Similarity.cosine(col("embedding"), col("embedding")).as("c"))
    val code = df.queryExecution.debug.codegenToSeq()
    assert(code.nonEmpty)
    assert(code.exists(_._2.contains("java.lang.Math.sqrt(")),
      "generated java should inline the fused dot+norm loop")
    df.collect().foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("graft_lsh_buckets matches the composed per-bit fold on real embeddings") {
    val mismatches = embeddings
      .select(
        Similarity.lshBuckets(col("embedding"), 64, 10, 4).as("native"),
        Similarity.lshBucketsComposed(col("embedding"), 64, 10, 4).as("composed"))
      .filter(not(col("native") <=> col("composed")))
      .count()
    assert(mismatches == 0)
  }

  test("graft_lsh_buckets degenerate vectors bucket to 0 in every table (composed zip_with semantics)") {
    val out = spark.sql(
      """SELECT graft_lsh_buckets(array(1.0F, 2.0F), 64, 10, 4),
        |       graft_lsh_buckets(array(1.0F, CAST(NULL AS FLOAT)), 2, 10, 4)""".stripMargin)
      .collect().head
    assert(out.getSeq[Long](0) == Seq(0L, 0L, 0L, 0L)) // length != dims
    assert(out.getSeq[Long](1) == Seq(0L, 0L, 0L, 0L)) // null element
  }

  test("graft_minhash_sig hash-chains exactly like xxhash64(lit(i), shingle)") {
    val df = Seq("alpha beta", "the quick brown fox", "x").toDF("sh")
    val native = df.select(
      call_function("graft_minhash_sig", array(col("sh")), lit(8)).as("sig"))
      .collect().map(_.getSeq[Long](0))
    val reference = df.select(
      array((0 until 8).map(i => xxhash64(lit(i), col("sh"))): _*).as("hs"))
      .collect().map(_.getSeq[Long](0))
    // a single-element shingle array's signature IS the per-i hash vector
    assert(native.toSeq == reference.toSeq)
  }

  test("graft_minhash_sig equals the composed Column fold on real documents") {
    val mismatches = documents
      .select(
        Dedup.minHashSignature(col("text"), 32).as("native"),
        Dedup.minHashSignatureComposed(col("text"), 32).as("composed"))
      .filter(not(col("native") <=> col("composed")))
      .count()
    assert(mismatches == 0)
  }

  test("graft_luhn equals the composed fold and pins known card vectors") {
    import testImplicits._
    // every 13-19-digit run derived from a base counter, plus the
    // classic test numbers (4111111111111111 valid; +1 neighbor not)
    val runs = ((0 until 200).map(i => ((1234567890123L + i * 7919L).toString + "0" * (i % 7)).take(19))
      ++ Seq("4111111111111111", "4111111111111112", "79927398713")).toDF("s")
    val mismatches = runs.select(
        PiiRedact.luhnValid(col("s")).as("native"),
        PiiRedact.luhnValidComposed(col("s")).as("composed"))
      .filter(not(col("native") <=> col("composed"))).count()
    assert(mismatches == 0)
    val pinned = spark.sql(
      "SELECT graft_luhn('4111111111111111'), graft_luhn('4111111111111112'), " +
        "graft_luhn('79927398713'), graft_luhn(CAST(NULL AS STRING))")
      .collect().head
    assert(pinned.getBoolean(0) && !pinned.getBoolean(1) && pinned.getBoolean(2))
    assert(pinned.isNullAt(3))
  }

  test("TextFunctions.jaccard (native kernel) equals the intersect/union form") {
    val pairs = documents.select(col("doc_id"), col("text").as("ta"))
      .join(documents.select((col("doc_id") + 1).as("doc_id"),
        col("text").as("tb")), Seq("doc_id"))
    val mismatches = pairs.select(
      TextFunctions.jaccard(col("ta"), col("tb")).as("native"),
      TextFunctions.jaccardComposed(col("ta"), col("tb")).as("composed"))
      .filter(not(col("native") <=> col("composed")))
      .count()
    assert(mismatches == 0)
  }

  test("graft_shingles equals the composed transform chain on real documents") {
    for (n <- Seq(2, 3, 8)) {
      val mismatches = documents
        .select(TextFunctions.shingles(col("text"), n).as("native"),
          TextFunctions.shinglesComposed(col("text"), n).as("composed"))
        .filter(not(col("native") <=> col("composed")))
        .count()
      assert(mismatches == 0, s"shingle mismatch at n=$n")
    }
  }

  test("graft_shingles edge cases match the composed form (empty, spaces, short, dups, null)") {
    val edge = Seq(
      Some(""), Some("   "), Some("one"), Some("one two"),
      Some("a b a b a b"),                 // duplicate shingles — distinct order
      Some("  leading and trailing  "),    // ASCII-space trim
      Some("tab\tand\nnewline separated"), // \s+ covers tabs/newlines
      None)
      .toDF("text")
    val rows = edge.select(
      TextFunctions.shingles(col("text"), 3).as("native"),
      TextFunctions.shinglesComposed(col("text"), 3).as("composed")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getSeq[String](0) === r.getSeq[String](1))
    }
  }

  test("graft_minhash_sig of an empty array is the fold identity (Long.MaxValue)") {
    val out = spark.sql(
      "SELECT graft_minhash_sig(CAST(array() AS ARRAY<STRING>), 4)").head().getSeq[Long](0)
    assert(out == Seq.fill(4)(Long.MaxValue))
  }

  test("graft_jaccard_sorted equals intersect/union arithmetic on real word sets") {
    val a = documents.select(col("doc_id"),
      sort_array(TextFunctions.wordSet(col("text"))).as("wa"))
    val b = documents.select((col("doc_id") - 1).as("doc_id"),
      sort_array(TextFunctions.wordSet(col("text"))).as("wb"))
    val joined = a.join(b, Seq("doc_id"))
    val inter = size(array_intersect(col("wa"), col("wb"))).cast("double")
    val uni = (size(col("wa")) + size(col("wb"))).cast("double") - inter
    val mismatches = joined.select(
      call_function("graft_jaccard_sorted", col("wa"), col("wb")).as("native"),
      when(uni === 0, 0.0).otherwise(inter / uni).as("composed"))
      .filter(not(col("native") <=> col("composed")))
      .count()
    assert(mismatches == 0)
    // edges: both empty -> 0.0, disjoint -> 0.0, identical -> 1.0, null -> NULL
    val edge = spark.sql(
      """SELECT graft_jaccard_sorted(CAST(array() AS ARRAY<STRING>), CAST(array() AS ARRAY<STRING>)),
        |       graft_jaccard_sorted(array('a','b'), array('c','d')),
        |       graft_jaccard_sorted(array('a','b','c'), array('a','b','c')),
        |       graft_jaccard_sorted(CAST(NULL AS ARRAY<STRING>), array('a'))""".stripMargin).head()
    assert(edge.getDouble(0) == 0.0)
    assert(edge.getDouble(1) == 0.0)
    assert(edge.getDouble(2) == 1.0)
    assert(edge.isNullAt(3))
  }

  test("graft_jaccard_sorted over hashed long sets equals the string-set value on real documents") {
    // the shuffle-payload form the near-dup verify arms use: Jaccard is
    // a set measure, so xxhash64-ing every member leaves the value
    // unchanged (collisionless on this corpus)
    def strings(c: org.apache.spark.sql.Column) =
      sort_array(TextFunctions.wordSet(c))
    def hashed(c: org.apache.spark.sql.Column) =
      sort_array(array_distinct(transform(TextFunctions.wordSet(c),
        w => xxhash64(w))))
    val a = documents.select(col("doc_id"), strings(col("text")).as("sa"),
      hashed(col("text")).as("ha"))
    val b = documents.select((col("doc_id") - 1).as("doc_id"),
      strings(col("text")).as("sb"), hashed(col("text")).as("hb"))
    val mismatches = a.join(b, Seq("doc_id")).select(
        call_function("graft_jaccard_sorted", col("sa"), col("sb")).as("s"),
        call_function("graft_jaccard_sorted", col("ha"), col("hb")).as("h"))
      .filter(not(col("s") <=> col("h")) || col("s").isNull || col("h").isNull)
      .count()
    assert(mismatches == 0)
    // long-array edges mirror the string ones; mixed types are rejected
    val edge = spark.sql(
      """SELECT graft_jaccard_sorted(CAST(array() AS ARRAY<BIGINT>), CAST(array() AS ARRAY<BIGINT>)),
        |       graft_jaccard_sorted(array(1L, 2L), array(3L, 4L)),
        |       graft_jaccard_sorted(array(1L, 2L, 3L), array(1L, 2L, 3L)),
        |       graft_jaccard_sorted(CAST(NULL AS ARRAY<BIGINT>), array(1L))""".stripMargin).head()
    assert(edge.getDouble(0) == 0.0)
    assert(edge.getDouble(1) == 0.0)
    assert(edge.getDouble(2) == 1.0)
    assert(edge.isNullAt(3))
    val err = intercept[Exception] {
      spark.sql("SELECT graft_jaccard_sorted(array(1L), array('a'))").collect()
    }
    assert(err.getMessage.contains("graft_jaccard_sorted"))
  }

  test("graft_match_frac equals the composed zip_with fraction on real signatures") {
    val sigs = documents.select(
      Dedup.minHashSignature(col("text"), 32).as("a"),
      Dedup.minHashSignature(reverse(col("text")), 32).as("b"))
    val mismatches = sigs.select(
      call_function("graft_match_frac", col("a"), col("b")).as("native"),
      (size(filter(zip_with(col("a"), col("b"), (x, y) => x === y),
        m => m)).cast("double") / 32).as("composed"))
      .filter(not(col("native") <=> col("composed")))
      .count()
    assert(mismatches == 0)
    // self-match is exactly 1.0; length mismatch is NULL
    val edge = spark.sql(
      """SELECT graft_match_frac(array(1L, 2L), array(1L, 2L)),
        |       graft_match_frac(array(1L), array(1L, 2L))""".stripMargin).head()
    assert(edge.getDouble(0) == 1.0)
    assert(edge.isNullAt(1))
  }

  test("graft_simhash equals the composed explode+sum plan on real documents") {
    val native = Dedup.simHash(documents, "text", "doc_id")
    val composed = Dedup.simHashComposed(documents, "text", "doc_id")
      .withColumnRenamed("simhash", "simhash_c")
    val mismatches = native.join(composed, Seq("doc_id"))
      .filter(not(col("simhash") <=> col("simhash_c")))
      .count()
    assert(mismatches == 0)
    assert(native.count() == composed.count())
  }

  test("graft_simhash of an empty token array is 0") {
    assert(spark.sql(
      "SELECT graft_simhash(CAST(array() AS ARRAY<STRING>))").head().getLong(0) == 0L)
  }

  test("graft_cosine properties: symmetry, [-1,1] bounds, positive-scale invariance") {
    val pairs = embeddings.select(col("vec_id"), col("embedding").as("a"))
      .join(embeddings.select((col("vec_id") + 1).as("vec_id"),
        col("embedding").as("b")), Seq("vec_id"))
    val checked = pairs.select(
      Similarity.cosine(col("a"), col("b")).as("ab"),
      Similarity.cosine(col("b"), col("a")).as("ba"),
      Similarity.cosine(
        transform(col("a"), x => x * 2.5f), col("b")).as("scaled"))
      .collect()
    assert(checked.nonEmpty)
    checked.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "cosine must be symmetric")
      assert(r.getDouble(0) >= -1.0 - 1e-12 && r.getDouble(0) <= 1.0 + 1e-12)
      // 1e-6: the scaling happens in float32 before the double
      // accumulation, so exactness is bounded by float round-off
      assert(math.abs(r.getDouble(0) - r.getDouble(2)) < 1e-6,
        "cosine must be invariant under positive scaling")
    }
  }

  test("graft_minhash_sig union law: sig(A ++ B) = elementwise min(sig(A), sig(B))") {
    // the defining property of MinHash — it makes signatures mergeable
    // (combine per-chunk signatures without re-reading documents)
    val df = documents.limit(50).select(
      TextFunctions.shingles(col("text"), 3).as("sa"),
      TextFunctions.shingles(reverse(col("text")), 3).as("sb"))
    val mismatches = df.select(
      call_function("graft_minhash_sig",
        concat(col("sa"), col("sb")), lit(16)).as("united"),
      zip_with(
        call_function("graft_minhash_sig", col("sa"), lit(16)),
        call_function("graft_minhash_sig", col("sb"), lit(16)),
        (x, y) => least(x, y)).as("merged"))
      .filter(not(col("united") <=> col("merged")))
      .count()
    assert(mismatches == 0)
  }

  test("graft_simhash order invariance: signature depends on the token multiset only") {
    val df = documents.limit(50)
    val mismatches = df.select(
      call_function("graft_simhash",
        TextFunctions.tokens(lower(col("text")))).as("fwd"),
      call_function("graft_simhash",
        reverse(TextFunctions.tokens(lower(col("text"))))).as("rev"))
      .filter(not(col("fwd") <=> col("rev")))
      .count()
    assert(mismatches == 0)
  }

  test("graft_hilbert: bijective on the grid, unit-step curve, masked inputs, null-safe") {
    // bits=4: the 16×16 grid — the kernel must traverse all 256 cells
    // with every consecutive pair grid-adjacent (THE Hilbert property;
    // a Z-curve fails it at every quadrant seam)
    val cells = for (x <- 0 until 16; y <- 0 until 16)
      yield (x.toLong, y.toLong, Hilbert.xy2d(4, x, y))
    assert(cells.map(_._3).sorted == (0L until 256L), "bijection onto 0..255")
    val byD = cells.map(c => c._3 -> ((c._1, c._2))).toMap
    (0L until 255L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"step $d -> ${d + 1} must be grid-adjacent")
    }
    // SQL surface parity with the kernel + masking + null propagation
    val out = spark.sql(
      """SELECT graft_hilbert(5, 9, 4),
        |       graft_hilbert(5 + 16, 9, 4),
        |       graft_hilbert(CAST(NULL AS BIGINT), 1, 4)""".stripMargin).head()
    assert(out.getLong(0) == Hilbert.xy2d(4, 5, 9))
    assert(out.getLong(1) == out.getLong(0), "out-of-range x is masked into the grid")
    assert(out.isNullAt(2))
  }

  test("minHashPairs and simHashPairs plans contain no aggregate exchange before banding") {
    // the signature stage must be shuffle-free: the only exchanges in
    // minHashPairs up to candidate generation are the self-join's
    val sigPlan = Dedup.simHash(documents, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!sigPlan.contains("Exchange"),
      "native simhash signature must not shuffle:\n" + sigPlan)
  }

  test("graft_clean_len equals length(regexp_replace(...)) on real documents + edges") {
    // the composed symbolRatio reference the kernel replaced
    def composedClean(c: org.apache.spark.sql.Column) =
      length(regexp_replace(lower(c), "[^a-z0-9 ]", "")).cast("long")
    val mismatches = documents
      .select(call_function("graft_clean_len", lower(col("text"))).as("n"),
        composedClean(col("text")).as("c"))
      .filter(not(col("n") <=> col("c"))).count()
    assert(mismatches == 0)
    val edges = Seq("", "   ", "ABC def", "a\tb\nc", "héllo wörld 中文 🙂 12",
      "!@#$%^&*()", "ümlaut ÉÈ ss")
      .toDF("t")
      .select(call_function("graft_clean_len", lower(col("t"))).as("n"),
        composedClean(col("t")).as("c"))
      .filter(not(col("n") <=> col("c"))).count()
    assert(edges == 0)
    assert(spark.sql("SELECT graft_clean_len(CAST(NULL AS STRING))").head.isNullAt(0))
  }

  test("graft_stop_ratio equals the composed filter/size chain on real documents + edges") {
    def composed(c: org.apache.spark.sql.Column) = {
      val ts = split(trim(lower(c)), "\\s+")
      val stops = size(filter(ts,
        (t: org.apache.spark.sql.Column) =>
          t.isInCollection(TextFunctions.Stopwords))).cast("double")
      when(size(ts) === 0, 0.0).otherwise(stops / size(ts).cast("double"))
    }
    def native(c: org.apache.spark.sql.Column) =
      call_function("graft_stop_ratio", lower(c),
        typedLit(TextFunctions.Stopwords))
    val mismatches = documents
      .select(native(col("text")).as("n"), composed(col("text")).as("c"))
      .filter(not(col("n") <=> col("c"))).count()
    assert(mismatches == 0)
    // edges: empty (split("") = [""] → ratio 0/1), whitespace-only,
    // leading tabs (leading "" token from the space-only trim),
    // all-stopwords, mixed case, null
    val edges = Seq("", " ", "\tthe and", "the the THE", "The quick the", "of")
      .toDF("t")
      .select(native(col("t")).as("n"), composed(col("t")).as("c"))
      .filter(col("n") =!= col("c") || col("n").isNull =!= col("c").isNull)
      .count()
    assert(edges == 0)
    assert(spark.sql(
      "SELECT graft_stop_ratio(CAST(NULL AS STRING), array('the'))").head.isNullAt(0))
  }

  test("graft_rep_ratio equals the explode/groupBy relational form on real documents") {
    // the t17 plan the kernel replaced: one row per bigram OCCURRENCE
    // through an exchange, counted per (doc, bigram), max/sum per doc
    val composed = documents
      .select(col("doc_id"),
        explode(TextFunctions.ngramsRaw(col("text"), 2)).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg((max(col("c")).cast("double") / sum(col("c"))).as("c_ratio"))
    val mismatches = documents
      .select(col("doc_id"),
        call_function("graft_rep_ratio", col("text"), lit(2)).as("n_ratio"))
      .join(composed, Seq("doc_id"), "left")
      .filter(not(coalesce(col("c_ratio"), lit(0.0)) <=> col("n_ratio")))
      .count()
    assert(mismatches == 0)
    // edges: < n tokens → 0.0 (empty, blank, single token), exact
    // repetition → 1.0, trigram n, null text → null
    val edge = Seq("", "   ", "one", "a b a b a b", "x y z").toDF("t")
      .select(call_function("graft_rep_ratio", col("t"), lit(2)).as("r"),
        call_function("graft_rep_ratio", col("t"), lit(3)).as("r3"))
      .collect()
    assert(edge.map(_.getDouble(0)).toSeq ===
      Seq(0.0, 0.0, 0.0, 3.0 / 5.0, 0.5))
    assert(edge.map(_.getDouble(1)).toSeq ===
      Seq(0.0, 0.0, 0.0, 2.0 / 4.0, 1.0 / 1.0))
    assert(spark.sql(
      "SELECT graft_rep_ratio(CAST(NULL AS STRING), 2)").head.isNullAt(0))
  }

  test("graft_dup_mass equals the explode/groupBy relational form on real documents") {
    // the t32 plan the kernel replaced: one row per 5-gram OCCURRENCE
    // through an exchange, counted per (doc, gram), dup-mass/sum per doc
    val composed = documents
      .select(col("doc_id"),
        explode(TextFunctions.ngramsRaw(col("text"), 5)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg((sum(when(col("c") >= 2, col("c")).otherwise(0L)).cast("double")
        / sum(col("c"))).as("c_frac"))
    val mismatches = documents
      .select(col("doc_id"),
        call_function("graft_dup_mass", col("text"), lit(5)).as("n_frac"))
      .join(composed, Seq("doc_id"), "left")
      .filter(not(coalesce(col("c_frac"), lit(0.0)) <=> col("n_frac")))
      .count()
    assert(mismatches == 0)
    // edges: < n tokens -> 0.0 (empty, blank, short); a 5-token doc has
    // exactly ONE 5-gram, so d5 is 0.0 even under full token repetition
    // while the same docs' bigrams are all duplicated; null -> null
    val edge = Seq("", "   ", "a b c d", "a a a a a", "a b a b a").toDF("t")
      .select(call_function("graft_dup_mass", col("t"), lit(5)).as("d5"),
        call_function("graft_dup_mass", col("t"), lit(2)).as("d2"))
      .collect()
    assert(edge.map(_.getDouble(0)).toSeq === Seq(0.0, 0.0, 0.0, 0.0, 0.0))
    // "a b a b a" bigrams: [a b, b a, a b, b a] -> all duplicated -> 1.0
    // "a a a a a" bigrams: [a a]x4 -> 1.0; "a b c d": all unique -> 0.0
    assert(edge.map(_.getDouble(1)).toSeq === Seq(0.0, 0.0, 0.0, 1.0, 1.0))
    assert(spark.sql(
      "SELECT graft_dup_mass(CAST(NULL AS STRING), 5)").head.isNullAt(0))
  }

  test("graft_token_profile equals the explode/window relational form on real documents") {
    import org.apache.spark.sql.expressions.Window
    // the t39 plan the kernel replaced: explode tokens, count per
    // (doc, token), window-sum per doc, entropy aggregate, left join
    val tf = documents.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        explode(TextFunctions.tokens(lower(col("text")))).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
    val n = sum(col("c")).over(Window.partitionBy(col("doc_id")))
    val p = col("c") / col("n").cast("double")
    val composed = tf.withColumn("n", n)
      .groupBy(col("doc_id"), col("n"))
      .agg((round(-sum(p * log(2.0, p)), 4) + 0.0).as("entropy"),
        count(lit(1)).as("n_types"))
    val mismatches = documents
      .withColumn("__p", call_function("graft_token_profile", col("text")))
      .select(col("doc_id"),
        (round(col("__p.entropy"), 4) + 0.0).as("ne"),
        col("__p.n_types").as("nt"), col("__p.n_tokens").as("nn"))
      .join(composed, Seq("doc_id"), "left")
      .filter(not(coalesce(col("entropy"), lit(0.0)) <=> col("ne")) ||
        not(coalesce(col("n_types"), lit(0L)) <=> col("nt")) ||
        not(coalesce(col("n").cast("long"), lit(0L)) <=> col("nn")))
      .count()
    assert(mismatches == 0)
    // edges: empty/whitespace-only -> (0.0, 0, 0); uniform two-token
    // doc -> entropy 1.0; case folding merges types; null -> null struct
    val edge = Seq("", "   ", "x y", "The the THE", "a a b b").toDF("t")
      .select(call_function("graft_token_profile", col("t")).as("p"))
      .select(col("p.entropy"), col("p.n_types"), col("p.n_tokens"))
      .collect()
    assert(edge.map(_.getDouble(0)).toSeq === Seq(0.0, 0.0, 1.0, -0.0, 1.0))
    assert(edge.map(_.getLong(1)).toSeq === Seq(0L, 0L, 2L, 1L, 2L))
    assert(edge.map(_.getLong(2)).toSeq === Seq(0L, 0L, 2L, 3L, 4L))
    assert(spark.sql(
      "SELECT graft_token_profile(CAST(NULL AS STRING))").head.isNullAt(0))
  }

  test("quality kernels participate in whole-stage codegen") {
    val df = documents.limit(20).select(
      TextFunctions.symbolRatio(col("text")).as("s"),
      TextFunctions.stopwordRatio(col("text")).as("r"),
      call_function("graft_rep_ratio", col("text"), lit(2)).as("rr"),
      call_function("graft_dup_mass", col("text"), lit(5)).as("dm"),
      call_function("graft_token_profile", col("text")).as("tp"))
    df.collect()
    val code = df.queryExecution.debug.codegenToSeq()
    assert(code.exists(_._2.contains("graft.expr.QualityKernel.cleanLen(")))
    assert(code.exists(_._2.contains("graft.expr.QualityKernel.stopRatio(")))
    assert(code.exists(_._2.contains("graft.expr.RepRatio.compute(")))
    assert(code.exists(_._2.contains("graft.expr.DupMass.compute(")))
    assert(code.exists(_._2.contains("graft.expr.TokenProfile.compute(")))
  }
}
