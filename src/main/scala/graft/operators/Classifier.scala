package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature logistic-regression TRAINING — the step that produces
  * the weights a fastText-style quality/domain classifier (t35's shape)
  * scores with. Everything upstream of this operator labels data
  * (heuristic gates, DSIR target slices); this closes the loop by
  * fitting the weights inside the engine with full-batch gradient
  * descent, one bounded aggregation per iteration — the
  * [[IvfIndex.train]] control-plane pattern applied to a linear model.
  *
  * Determinism (the property that makes the trained weights
  * artifact-able, same contract as the k-means centroids):
  *   - features are md5-hashed unigram buckets (the cross-engine t35
  *     idiom), tf-normalized per document, plus a bias feature;
  *   - init = all-zero weights, fixed iteration count, fixed rate (no
  *     RNG, no convergence test);
  *   - after each update every weight is ROUNDED to `roundDp` decimals
  *     (BigDecimal HALF_UP = Spark's round): partial-aggregation order
  *     perturbs the gradient sums at ~1e-13, and lr·1e-13 is far below
  *     the half-ulp of the rounding, so the weight sequence is
  *     bit-identical across runs, partitionings, and cluster sizes.
  *
  * Scale shape: the token→bucket feature table is computed ONCE and
  * cached ((y, n, buckets) — fixed-width rows, no text); each iteration
  * is one scan of it plus a `dims+1`-cell aggregation shuffle, with the
  * weight vector riding as a plan literal (broadcast-sized by
  * construction: 257 doubles). The collect is control-plane
  * ([[graft.core.Bounded]], exactly dims+1 rows). No per-doc state ever
  * reaches the driver. */
object Classifier {

  /** md5 feature bucket in [0, dims) — value-identical to the DuckDB
    * `('0x' || substr(md5(t),1,4))::BIGINT % dims` (t34/t35/t38). */
  def bucket(t: Column, dims: Int): Column =
    conv(substring(md5(t), 1, 4), 16, 10).cast("long") % dims

  /** Lowercased whitespace tokens of non-blank text. */
  private def toks(text: Column): Column =
    when(length(trim(coalesce(text, lit("")))) === 0,
      array().cast("array<string>"))
      .otherwise(split(trim(lower(coalesce(text, lit("")))), "\\s+"))

  /** Train logistic-regression weights for P(labelCol | text).
    * Returns `dims + 1` doubles — index `dims` is the bias. */
  def train(df: DataFrame, textCol: String, labelCol: Column,
            dims: Int = 256, iters: Int = 15, lr: Double = 0.5,
            roundDp: Int = 6): Seq[Double] = {
    require(dims >= 1 && iters >= 1 && lr > 0)
    trainCore(df, textCol, labelCol, None, dims, iters, lr, roundDp, 1)
  }

  /** [[train]] with deterministic hash-selected MINI-BATCHES — the
    * 100 TB path: full-batch GD reads the whole corpus `iters` times,
    * which at cluster scale turns a 15-iteration fit into 15 full
    * passes over 100 TB. This variant selects, per iteration `i`
    * (1-based), the docs whose `md5(i || '|' || id)` 16-bit prefix is
    * ≡ 0 (mod `sample`) — a disjoint-ish 1/sample slice that rotates
    * deterministically per iteration, so each pass reads 1/sample of
    * the data while every doc still participates over enough
    * iterations. Determinism contract unchanged (same md5 idiom as
    * [[bucket]], same per-update rounding), so the weights remain an
    * artifact like t57's, replayable by any engine. `sample = 1`
    * selects everything and reproduces [[train]] exactly (spec-pinned).
    * The gradient normalizes by the SELECTED count (computed inside the
    * same dims+2-cell aggregation — still one action per iteration);
    * an iteration whose slice is empty leaves the weights unchanged. */
  /** [[trainMiniBatch]] with the feature-table cache as a knob —
    * `cache = false` is the actual 100 TB posture: persisting the
    * tokenized corpus for the iteration loop is the right call up to
    * what the cluster's storage memory holds, but at corpus scales
    * where the cache itself spills-and-thrashes, each iteration should
    * instead RE-SCAN the raw corpus and filter to its 1/sample slice —
    * `iters` scans of (1/sample)·corpus beats one full materialization
    * plus `iters` cache reads once the feature table stops fitting.
    * The weight sequence is bit-identical either way (spec-pinned):
    * caching only changes where bytes are read from, and the
    * per-update rounding contract absorbs nothing differently. */
  def trainMiniBatch(df: DataFrame, textCol: String, labelCol: Column,
                     idCol: Column, dims: Int = 256, iters: Int = 15,
                     lr: Double = 0.5, roundDp: Int = 6,
                     sample: Int = 4, cache: Boolean = true): Seq[Double] = {
    require(dims >= 1 && iters >= 1 && lr > 0)
    require(sample >= 1, s"sample must be >= 1, got $sample")
    trainCore(df, textCol, labelCol, Some(idCol), dims, iters, lr,
      roundDp, sample, cache)
  }

  private def trainCore(df: DataFrame, textCol: String, labelCol: Column,
                        idCol: Option[Column], dims: Int, iters: Int,
                        lr: Double, roundDp: Int, sample: Int,
                        cache: Boolean = true): Seq[Double] = {
    // the one corpus-derived table the loop touches: per doc its label,
    // id string (mini-batch selection key), token count, and the hashed
    // bucket of every token. Fixed-width rows; cached (the default) so
    // iterations read columnar blocks, not text — see trainMiniBatch's
    // cache knob for the re-scan posture.
    // NULL ids coalesce to "" — otherwise md5(concat(iter, NULL)) is
    // NULL and the row would silently vanish from EVERY mini-batch
    //
    // Parallelism floor (r19, measured): a small input arrives as few
    // scan splits (one 0.6 MB parquet file = ONE task at sf0.1), and
    // since every iteration's tokenize + gradient explode runs inside
    // those splits, the 15-iteration loop ran at 1.6–1.9 effective
    // cores on a 32-core box (bench cpu/wall). Widening the RAW rows
    // to defaultParallelism BEFORE tokenization fixes both postures —
    // cached: the persisted blocks spread over every core; uncached
    // (t104): each iteration's tokenize pass fans out after a cheap
    // exchange of raw (label, id, text) rows. When the input already
    // has ≥ that many splits (any real-scale corpus) this is a no-op —
    // no extra exchange at 100 TB. Weight bit-identity across
    // partitionings is the operator's documented contract (roundDp
    // rounding swallows the ~1e-13 partial-sum reorder); re-verified
    // against the committed golden weights at every oracle SF.
    val raw = df.select(
        labelCol.cast("int").cast("double").as("y"),
        coalesce(idCol.getOrElse(lit("")).cast("string"), lit("")).as("sid"),
        col(textCol).as("__text"))
    val np = df.sparkSession.sparkContext.defaultParallelism
    // toRdd (not .rdd): the physical-plan partition count without
    // building the row-deserializer conversion the gate would discard
    val wide =
      if (raw.queryExecution.toRdd.getNumPartitions < np) raw.repartition(np)
      else raw
    // graft_md5_buckets = the bucket() transform as one native call per
    // row (the composed transform+md5+conv chain is CodegenFallback —
    // interpreted per token); value-identity pinned by the committed
    // weight artifacts (GoldenSpec retrains through this path)
    val plan = wide.select(
        col("y"), col("sid"), toks(col("__text")).as("__t"))
      .select(col("y"), col("sid"),
        size(col("__t")).cast("double").as("n"),
        call_function("graft_md5_buckets", col("__t"), lit(dims)).as("bs"))
    val feats =
      if (cache) plan.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else plan
    try {
      require(feats.count() > 0, "Classifier.train needs a non-empty corpus")
      var w: IndexedSeq[Double] = IndexedSeq.fill(dims + 1)(0.0)
      var i = 0
      while (i < iters) {
        val wLit = typedLit(w)
        // the iteration's slice: md5(iter || '|' || id) 16-bit prefix
        // ≡ 0 (mod sample). sample = 1 skips the filter so the scan is
        // identical to the classic full-batch plan.
        val batch =
          if (sample == 1) feats
          else feats.where(
            conv(substring(md5(concat(lit(s"${i + 1}|"), col("sid"))),
              1, 4), 16, 10).cast("long") % sample === 0)
        // the iteration's whole gradient as ONE typed aggregate
        // (expr/ClassifierExpressions.LogisticGradAgg): margin fold,
        // logistic error, per-token scatter and the bias/count cells
        // land in a dims+2-double partition buffer — no exploded
        // token stream, no interpreted higher-order lambdas, and the
        // iteration shuffles partitions × (dims+2) doubles instead of
        // one row per token. Cell values match the old explode +
        // groupBy(b).sum within the documented ~1e-13 partial-order
        // band that the per-update rounding absorbs (weights re-pinned
        // against the committed artifacts at every SF).
        val grad = batch.select(call_function("graft_logit_grad",
            col("y"), col("n"), col("bs"), wLit).as("g"))
          .head().getSeq[Double](0)
        // normalize by the SELECTED doc count (== corpus size when
        // sample = 1: the count cell sums exact integer-valued doubles)
        val nBatch = grad(dims + 1)
        if (nBatch > 0) {
          w = w.indices.map { b =>
            java.math.BigDecimal
              .valueOf(w(b) - lr * grad(b) / nBatch)
              .setScale(roundDp, java.math.RoundingMode.HALF_UP)
              .doubleValue() + 0.0
          }
        }
        i += 1
      }
      w
    } finally if (cache) feats.unpersist(blocking = false)
  }

  /** Score a corpus with trained weights: (idCol, margin, label) where
    * margin = w·x rounded to 4 dp and label = keep iff the rounded
    * margin is positive (⟺ P > 0.5). Tokenless documents score the
    * bias alone. Pure scan-stage row-map; weights ride as a plan
    * literal.
    *
    * The rounding is EXACT-INTEGER, not floating: the trainer's
    * per-update rounding makes every weight a 6-dp decimal, so
    * `w·10^6` is an exact long and the margin `(Σw)/n + bias` is the
    * rational `T / (10^6·n)` with `T = Σw_int + bias_int·n` computed
    * without error. Its half-away-from-zero 4-dp rounding is then the
    * pure integer `sign(T)·((|T| + 50n) div 100n)` — bit-identical in
    * any engine. A double-sum `round(x, 4)` is NOT: summation order
    * perturbs x by ~1 ulp, and a margin sitting exactly on a
    * `…5·10^-5` boundary (common, the inputs being 6-dp rationals)
    * rounds differently per engine — observed as a one-row 4th-dp
    * oracle mismatch at sf0.1. */
  def score(df: DataFrame, idCol: String, textCol: String,
            weights: Seq[Double], dims: Int = 256): DataFrame = {
    require(weights.length == dims + 1,
      s"expected ${dims + 1} weights, got ${weights.length}")
    // exact: each weight is a 6-dp decimal by the trainer's contract.
    // Native kernels (graft_md5_buckets / graft_lr_dot) replace the
    // interpreted transform+aggregate folds — same integer values.
    val wLit = typedLit(weights.map(w => math.round(w * 1e6)))
    val bs = call_function("graft_md5_buckets", toks(col(textCol)), lit(dims))
    val n = size(bs).cast("long")
    val sum = call_function("graft_lr_dot", bs, wLit)
    val bias = element_at(wLit, dims + 1)
    val t = when(n > 0, sum + bias * n).otherwise(bias)
    val den = when(n > 0, n).otherwise(lit(1L)) * 100L
    df.select(col(idCol), t.as("__t"), den.as("__d"))
      .select(col(idCol),
        (signum(col("__t")).cast("long") *
          floor((abs(col("__t")) + col("__d") / 2) / col("__d")).cast("long"))
          .as("__m4"))
      .select(col(idCol),
        (col("__m4").cast("double") / 1e4).as("margin"),
        when(col("__m4") > 0, "keep").otherwise("drop").as("label"))
  }
}
