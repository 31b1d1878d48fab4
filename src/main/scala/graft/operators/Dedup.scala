package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication suite for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard.
  *
  * Scale contract (the 100 TB design rule): **only ids and fixed-size
  * signatures ever travel through the exploded band/block shuffles** —
  * document text is re-joined by id exactly once, for the final exact
  * verification over the (small) candidate-pair set. Candidate pairs are
  * `distinct`-ed *before* any text is touched, so a pair colliding in k
  * bands/blocks costs one verification, not k. No all-pairs stage exists;
  * bucket skew is bounded by doc-frequency caps and AQE skew-join.
  */
object Dedup {

  /** Exact dedup: group by normalized-content fingerprint, keep the
    * smallest id per group. One hash-aggregate shuffle on the 128-bit key. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(TextFunctions.fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact token-set Jaccard verification for candidate id-pairs:
    * tokenize each document ONCE into its distinct word set, join the
    * (id, words, |words|) side tables by id, and compute
    * |A∩B| / (|A|+|B|−|A∩B|) — one array_intersect per pair instead of
    * two regex re-tokenizations plus intersect+union (identical values:
    * the inputs are distinct arrays, so |A∪B| = |A|+|B|−|A∩B|).
    * Appends a `jaccard` column rounded to 4 dp. */
  private def verifyJaccard(candidates: DataFrame, docs: DataFrame,
      minJaccard: Option[Double] = None): DataFrame = {
    val ws = docs.select(col("doc_id"),
      TextFunctions.wordSet(col("text")).as("words"))
      .select(col("doc_id"), col("words"), size(col("words")).as("n"))

    // provable length prefilter when a threshold is known:
    // J(A,B) <= min(|A|,|B|) / max(|A|,|B|), so pairs outside the size
    // band can never reach the threshold — they are dropped BEFORE the
    // (heavy) word-array join using a skinny (id, n) join only. Exact
    // semantics preserved: only certainly-below-threshold pairs skipped.
    val sized = minJaccard match {
      case Some(t) if t > 0 =>
        val ln = ws.select(col("doc_id").as("left_id"), col("n").as("__ln"))
        val rn = ws.select(col("doc_id").as("right_id"), col("n").as("__rn"))
        candidates.join(ln, Seq("left_id")).join(rn, Seq("right_id"))
          .filter(least(col("__ln"), col("__rn")).cast("double")
            >= greatest(col("__ln"), col("__rn")) * t)
          .drop("__ln", "__rn")
      case _ => candidates
    }

    val lw = ws.select(col("doc_id").as("left_id"),
      col("words").as("__lw"), col("n").as("__ln"))
    val rw = ws.select(col("doc_id").as("right_id"),
      col("words").as("__rw"), col("n").as("__rn"))
    val inter = size(array_intersect(col("__lw"), col("__rw"))).cast("double")
    val uni = (col("__ln") + col("__rn")).cast("double") - inter
    sized.join(lw, Seq("left_id")).join(rw, Seq("right_id"))
      .withColumn("jaccard",
        round(when(uni === 0, 0.0).otherwise(inter / uni), 4))
      .drop("__lw", "__rw", "__ln", "__rn")
  }

  /** MinHash signature: for each of `numHashes` hash functions i, the min
    * over shingles of h_i(s) where h_i(s) = xxhash64(i, s) — the standard
    * "many independent hash functions" construction. Computed in ONE pass
    * over the shingle array: fold with a `numHashes`-wide running-min
    * accumulator (`aggregate` + `zip_with(least)`), rather than one
    * array traversal per hash function. Returns ArrayType(Long). */
  def minHashSignature(text: Column, numHashes: Int, shingleSize: Int = 3): Column = {
    val sh = TextFunctions.shingles(text, shingleSize)
    aggregate(
      sh,
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, s) => zip_with(
        acc,
        transform(sequence(lit(0), lit(numHashes - 1)), i => xxhash64(i, s)),
        (a, h) => least(a, h)))
  }

  /** MinHash-LSH candidate pairs: band the signature (`bands` bands of
    * `numHashes/bands` rows), bucket-join on (band, hash-of-band-slice),
    * emit distinct candidate pairs with estimated Jaccard (fraction of
    * matching signature positions) and exact token-set Jaccard.
    *
    * Scale shape: the exploded stream is (doc_id, sig, band, bucket) —
    * ~`bands × (8·numHashes + 16)` bytes/doc regardless of document size.
    * Candidate id-pairs are distinct-ed, then text is joined back by id
    * once per side for the exact-Jaccard verify. With b=8, r=4 the
    * collision threshold is (1/b)^(1/r) ≈ 0.59 Jaccard.
    */
  def minHashPairs(df: DataFrame, textCol: String, idCol: String,
                   numHashes: Int = 32, bands: Int = 8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val docs = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    // signature via explode + codegen'd min-aggregates (identical values
    // to minHashSignature's Column fold, ~3x faster: higher-order
    // lambdas run interpreted; min() partial-aggregates map-side so the
    // shuffle carries one row per doc)
    val withSig = docs
      .select(col("doc_id"),
        explode(TextFunctions.shingles(col("text"), 3)).as("__sh"))
      .groupBy(col("doc_id"))
      .agg(array((0 until numHashes).map(i =>
        min(xxhash64(lit(i), col("__sh")))): _*).as("sig"))

    // (doc_id, sig, band, bucket) — no text beyond this point
    val banded = withSig.select(col("doc_id"), col("sig"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64(slice(col("sig"), b * rows + 1, lit(rows))).as("bucket"))))
        .as("bb"))
      .select(col("doc_id"), col("sig"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))

    val l = banded.select(col("band"), col("bucket"),
      col("doc_id").as("left_id"), col("sig").as("left_sig"))
    val r = banded.select(col("band"), col("bucket"),
      col("doc_id").as("right_id"), col("sig").as("right_sig"))

    val matchFrac = size(filter(
      zip_with(col("left_sig"), col("right_sig"), (a, b) => a === b),
      m => m)).cast("double") / numHashes

    // distinct BEFORE the word-set join: one verification per pair, not per band
    val candidates = l.join(r, Seq("band", "bucket"))
      .filter(col("left_id") < col("right_id"))
      .select(col("left_id"), col("right_id"),
        round(matchFrac, 4).as("est_jaccard"))
      .distinct()

    verifyJaccard(candidates, docs)
      .select(col("left_id"), col("right_id"), col("est_jaccard"), col("jaccard"))
  }

  /** SimHash: 64-bit signature where bit k is the sign of the sum over
    * tokens of ±1 votes from bit k of each token's hash. Near-dups have
    * small Hamming distance.
    *
    * Distributed shape: explode tokens → 64 codegen'd partial-sum
    * aggregates on doc id. The explode is narrow (a doc's tokens stay in
    * its partition), so map-side partial aggregation collapses to ONE
    * row per doc per partition before the exchange — the shuffle carries
    * #docs rows, not #tokens. (A shuffle-free higher-order-function fold
    * was measured 2x slower: lambda expressions evaluate interpreted,
    * outside whole-stage codegen.) */
  def simHash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    // votes: for each of 64 bits, +1 if bit set else -1; sum per doc
    val bitCols = (0 until 64).map { k =>
      sum(when(shiftright(col("h"), k).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$k")
    }
    val voted = toks.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
    val sig = (0 until 64).map { k =>
      when(col(s"b$k") > 0, shiftleft(lit(1L), k)).otherwise(0L)
    }.reduce((a: Column, b: Column) => a.bitwiseOR(b))
    voted.select(col("doc_id"), sig.as("simhash"))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs within Hamming radius, via multi-block
    * partitioning (Manku et al.'s permuted-table scheme, simplified to
    * contiguous blocks): split the 64-bit signature into `blocks` nearly
    * equal bit-blocks, explode each doc to one row per block, and join on
    * (block index, block bits). By pigeonhole, any pair within Hamming
    * distance < `blocks` shares at least one identical block, so recall is
    * COMPLETE for maxHamming ≤ blocks − 1 (pass blocks = maxHamming + 1
    * for a guarantee). Only (doc_id, simhash) rides the explode — 16
    * bytes/doc/block. */
  def simHashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 8, blocks: Int = 4): DataFrame = {
    require(blocks >= 2 && blocks <= 64, "blocks must be in [2, 64]")
    // block k covers bits [offsets(k), offsets(k+1)) of the signature
    val base = 64 / blocks
    val rem = 64 % blocks
    val widths = (0 until blocks).map(k => if (k < rem) base + 1 else base)
    val offsets = widths.scanLeft(0)(_ + _)
    val sigs = simHash(df, textCol, idCol)
    val exploded = sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 until blocks).map { k =>
        struct(lit(k).as("blk"),
          shiftright(col("simhash"), offsets(k))
            .bitwiseAND(lit((1L << widths(k)) - 1)).as("bits"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("simhash"),
        col("bb.blk").as("blk"), col("bb.bits").as("bits"))
    val l = exploded.select(col("blk"), col("bits"),
      col("doc_id").as("left_id"), col("simhash").as("left_sig"))
    val r = exploded.select(col("blk"), col("bits"),
      col("doc_id").as("right_id"), col("simhash").as("right_sig"))
    l.join(r, Seq("blk", "bits"))
      .filter(col("left_id") < col("right_id"))
      .withColumn("hamming", hamming(col("left_sig"), col("right_sig")))
      .filter(col("hamming") <= maxHamming)
      .select(col("left_id"), col("right_id"), col("hamming"))
      .distinct()
  }

  /** n-gram Jaccard near-dup pairs via shared-shingle blocking: docs
    * sharing at least one rare shingle are candidates; exact Jaccard
    * (computed ONCE per distinct candidate pair, after a text re-join by
    * id) filters. `maxDocFreq` drops stop-shingles so bucket sizes stay
    * bounded — the skew guard that matters at scale. Only (shingle,
    * doc_id) rides the blocking shuffle. */
  def jaccardPairs(df: DataFrame, textCol: String, idCol: String,
                   threshold: Double, shingleSize: Int = 3,
                   maxDocFreq: Int = 20): DataFrame = {
    val docs = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val docSh = docs.select(col("doc_id"),
      explode(TextFunctions.shingles(col("text"), shingleSize)).as("shingle"))
    val rare = docSh.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq && col("df") >= 2)
      .select(col("shingle"))
    val blocked = docSh.join(rare, Seq("shingle"))
    val l = blocked.select(col("shingle"), col("doc_id").as("left_id"))
    val r = blocked.select(col("shingle"), col("doc_id").as("right_id"))
    val candidates = l.join(r, Seq("shingle"))
      .filter(col("left_id") < col("right_id"))
      .select(col("left_id"), col("right_id"))
      .distinct()
    verifyJaccard(candidates, docs, minJaccard = Some(threshold))
      .select(col("left_id"), col("right_id"), col("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
