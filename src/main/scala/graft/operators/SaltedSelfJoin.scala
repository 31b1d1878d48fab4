package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunk-salted self-join pair enumeration — the shared scale guard for
  * every bucket-blocked candidate generator (simhash blocks, minhash
  * bands, embedding LSH tables).
  *
  * The hazard it removes (caught live by the round-10 scaling probe,
  * t08 at 10×: 1003 s wall ≈ 1037 s cpu, i.e. ONE task): a dense
  * corpus concentrates a large share of all rows into one bucket key,
  * and the bucket's quadratic pair join becomes join-amplification
  * skew that AQE cannot fix — both its skew split and its partition
  * coalescing trigger on input BYTES, and a 50 k-row bucket is ~1 MB
  * in, ~10⁹ pairs out. AQE will even actively COALESCE the salted join
  * back into one task (measured 718 s), which is why the explicitly
  * NUMBERED repartition below is load-bearing: Spark preserves
  * user-numbered repartitions from AQE coalescing.
  *
  * The premium is GATED (round-12): the chunk machinery — count join,
  * per-side explode, two pinned repartitions — is insurance against
  * oversized buckets, and on a well-distributed corpus it was measured
  * costing ~1.4–2× over the plain join it protects (t07 4.2 s vs
  * 3.06 s at 10×). The per-bucket count aggregate is computed anyway,
  * so ONE extra control-plane scalar (its max) decides at build time:
  * no bucket above `chunkSize` → the classic unsalted join, which is
  * exactly the salted plan's m = 1 degenerate case. Callers that
  * already know the corpus shape can skip even that pass via
  * `maxBucketHint`; an over-estimate costs only the premium, an
  * under-estimate risks the serial collapse, so hint conservatively.
  *
  * Mechanics when salting engages: per bucket of n rows, members are
  * split into m = ceil(n / chunkSize) chunks by id hash, and the chunk
  * pair (i ≤ j) becomes part of the join key — the bucket's m(m+1)/2
  * chunk pairs then land on that many join keys and spread over the
  * pinned partition width. Per-row replication is ~m copies of a thin
  * row, paid only by oversized buckets.
  *
  * Output contract (both paths): one row per colliding ordered
  * (pair, bucket-key) — same-chunk (and all unsalted) pairs surface in
  * both orientations, cross-chunk pairs with the LOWER-CHUNK member on
  * the left. Callers therefore canonicalize with least/greatest and
  * `distinct()` (which they already need for multi-bucket collisions). */
object SaltedSelfJoin {

  /** Enumerate colliding pairs of `bucketed` rows sharing all `keys`.
    * Output columns: `keys…, left_id, right_id, left_<p>, right_<p>`
    * for each payload column p.
    *
    * NOTE: unless `maxBucketHint` is supplied, this runs ONE eager
    * count-aggregate job over `bucketed` at build time (control-plane:
    * a single max scalar reaches the driver) to decide whether the
    * chunk machinery is needed. */
  def pairs(bucketed: DataFrame, keys: Seq[String], idCol: String,
            payload: Seq[String] = Seq.empty,
            chunkSize: Int = 2048,
            maxBucketHint: Option[Long] = None): DataFrame = {
    require(chunkSize >= 2, "chunkSize must be >= 2")
    val keyCols = keys.map(col)
    val counts = bucketed.groupBy(keyCols: _*).agg(count(lit(1)).as("__n"))
    val oversized = maxBucketHint match {
      case Some(m) => m > chunkSize
      case None =>
        val r = counts.agg(max(col("__n"))).head()
        !r.isNullAt(0) && r.getLong(0) > chunkSize
    }
    if (!oversized) {
      // every bucket fits one chunk: the salted plan would degenerate to
      // m = 1 everywhere — emit the plain self-join it equals, without
      // the count join, explodes, or pinned repartitions
      val lsel = keyCols ++ Seq(col(idCol).as("left_id")) ++
        payload.map(p => col(p).as(s"left_$p"))
      val rsel = keyCols ++ Seq(col(idCol).as("right_id")) ++
        payload.map(p => col(p).as(s"right_$p"))
      // merge-hinted: both sides are the same O(corpus) exploded frame;
      // its static size estimate shrinks through the explode chain (the
      // t42 signature) and a statically-planned broadcast of it OOMs at
      // scale (r16 audit: the t08 side truth-counted at 51 M rows /
      // 2.5 GB on the heaps 100× corpus under a 52 MB estimate)
      return bucketed.select(lsel: _*)
        .join(bucketed.select(rsel: _*).hint("merge"), keys)
        .filter(col("left_id") =!= col("right_id"))
    }
    // merge-hinted (r17): `counts` is an aggregate whose static size
    // estimate collapses while its true cardinality is the BUCKET
    // count — tiny under single-block keys (3.6 k at t08 classic) but
    // 11.8 M rows under multi-block keys at the 100× heaps decade,
    // where the statically-planned broadcast OOMed an 8 GiB driver
    // (caught live by the r17 capless-floor probe). Same t42-class
    // fix as every other collapsed-estimate join in the engine.
    val sized = bucketed.join(counts.hint("merge"), keys)
      .withColumn("__m",
        ceil(col("__n").cast("double") / chunkSize).cast("int"))
      .withColumn("__c", pmod(xxhash64(col(idCol)), col("__m")).cast("int"))
    val lsel = keyCols ++
      Seq(col("__c").as("__i"),
        explode(sequence(col("__c"), col("__m") - 1)).as("__j"),
        col(idCol).as("left_id")) ++
      payload.map(p => col(p).as(s"left_$p"))
    val rsel = keyCols ++
      Seq(explode(sequence(lit(0), col("__c"))).as("__i"),
        col("__c").as("__j"),
        col(idCol).as("right_id")) ++
      payload.map(p => col(p).as(s"right_$p"))
    val parts = bucketed.sparkSession.sessionState.conf.numShufflePartitions
    val saltKeys = keys ++ Seq("__i", "__j")
    // merge hint for the same reason as the unsalted path above — and
    // SMJ consumes the pinned repartitions' hash partitioning directly,
    // so the hint adds sorts but no exchanges
    sized.select(lsel: _*).repartition(parts, saltKeys.map(col): _*)
      .join(sized.select(rsel: _*).repartition(parts, saltKeys.map(col): _*)
        .hint("merge"),
        saltKeys)
      .filter(col("left_id") =!= col("right_id"))
      .drop("__i", "__j")
  }
}
