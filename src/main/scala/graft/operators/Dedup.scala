package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication suite for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard. All shapes are shuffle-on-key
  * aggregations or bucketed self-joins — no pairwise O(n²) stage ever
  * touches more than one LSH bucket, which is what keeps these viable at
  * 100 TB (bucket sizes stay bounded; skewed buckets are split by AQE).
  */
object Dedup {

  /** Exact dedup: group by normalized-content fingerprint, keep the
    * smallest id per group. One hash-aggregate shuffle on the 128-bit key. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(TextFunctions.fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: for each of `numHashes` permutations i, the min
    * over shingles of h_i(s) where h_i(s) = xxhash64(s, seed=i) — the
    * standard "many independent hash functions" construction. Returns an
    * ArrayType(Long) column. */
  def minHashSignature(text: Column, numHashes: Int, shingleSize: Int = 3): Column = {
    val sh = TextFunctions.shingles(text, shingleSize)
    val sigs = (0 until numHashes).map { i =>
      array_min(transform(sh, s => xxhash64(lit(i), s)))
    }
    array(sigs: _*)
  }

  /** MinHash-LSH candidate pairs: band the signature (`bands` bands of
    * rows), bucket-join on (band, band-slice hash), emit distinct
    * candidate pairs with their estimated Jaccard (fraction of matching
    * signature positions) and exact token-set Jaccard.
    *
    * Scale shape: explode to (doc × bands) rows → shuffle on bucket key →
    * within-bucket self-join. With b=8,r=4 the collision threshold is
    * (1/b)^(1/r) ≈ 0.59 Jaccard.
    */
  def minHashPairs(df: DataFrame, textCol: String, idCol: String,
                   numHashes: Int = 32, bands: Int = 8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val withSig = df.select(col(idCol).as("doc_id"), col(textCol).as("text"),
      minHashSignature(col(textCol), numHashes).as("sig"))

    val banded = withSig.select(col("doc_id"), col("text"), col("sig"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64(b, to_json(struct(slice(col("sig"), b * rows + 1, lit(rows))))).as("bucket"))))
        .as("bb"))
      .select(col("doc_id"), col("text"), col("sig"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))

    val l = banded.select(col("band"), col("bucket"), col("doc_id").as("left_id"),
      col("text").as("left_text"), col("sig").as("left_sig"))
    val r = banded.select(col("band"), col("bucket"), col("doc_id").as("right_id"),
      col("text").as("right_text"), col("sig").as("right_sig"))

    val matchFrac = size(filter(
      zip_with(col("left_sig"), col("right_sig"), (a, b) => a === b),
      m => m)).cast("double") / numHashes
    l.join(r, Seq("band", "bucket"))
      .filter(col("left_id") < col("right_id"))
      .select(col("left_id"), col("right_id"),
        round(matchFrac, 4).as("est_jaccard"),
        round(TextFunctions.jaccard(col("left_text"), col("right_text")), 4).as("jaccard"))
      .distinct()
  }

  /** SimHash: 64-bit signature where bit k is the sign of the sum over
    * tokens of ±1 votes from bit k of each token's hash. Near-dups have
    * small Hamming distance. Distributed shape: explode tokens → per-bit
    * partial sums via groupBy — one shuffle on doc id. */
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

  /** SimHash near-dup pairs within Hamming radius, blocked on the top
    * 16 bits (docs differing only in low bits collide; multi-block
    * variants trade recall for cost). */
  def simHashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 8): DataFrame = {
    val sigs = simHash(df, textCol, idCol)
      .withColumn("block", shiftright(col("simhash"), 48))
    val l = sigs.select(col("block"), col("doc_id").as("left_id"), col("simhash").as("left_sig"))
    val r = sigs.select(col("block"), col("doc_id").as("right_id"), col("simhash").as("right_sig"))
    l.join(r, Seq("block"))
      .filter(col("left_id") < col("right_id"))
      .withColumn("hamming", hamming(col("left_sig"), col("right_sig")))
      .filter(col("hamming") <= maxHamming)
      .select(col("left_id"), col("right_id"), col("hamming"))
  }

  /** n-gram Jaccard near-dup pairs via shared-shingle blocking: docs
    * sharing at least one rare shingle are candidates; exact Jaccard
    * filters. `maxDocFreq` drops stop-shingles so bucket sizes stay
    * bounded (the skew guard that matters at scale). */
  def jaccardPairs(df: DataFrame, textCol: String, idCol: String,
                   threshold: Double, shingleSize: Int = 3,
                   maxDocFreq: Int = 20): DataFrame = {
    // two-step projection: aliasing textCol and exploding a derivation of
    // it in one select trips Spark's lateral-column-alias resolution
    val docSh = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .select(col("doc_id"), col("text"),
        explode(TextFunctions.shingles(col("text"), shingleSize)).as("shingle"))
    val rare = docSh.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq && col("df") >= 2)
      .select(col("shingle"))
    val blocked = docSh.join(rare, Seq("shingle"))
    val l = blocked.select(col("shingle"), col("doc_id").as("left_id"), col("text").as("left_text"))
    val r = blocked.select(col("shingle"), col("doc_id").as("right_id"), col("text").as("right_text"))
    l.join(r, Seq("shingle"))
      .filter(col("left_id") < col("right_id"))
      .select(col("left_id"), col("right_id"),
        round(TextFunctions.jaccard(col("left_text"), col("right_text")), 4).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }
}
