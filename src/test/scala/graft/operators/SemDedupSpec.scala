package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SemDeDup semantics: planted near-identical vectors are pruned in
  * favor of their lower-id originals, dissimilar vectors survive, and
  * the operator is deterministic across runs. */
class SemDedupSpec extends SparkSpec {
  import testImplicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def plantedEmb = {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    embs.unionAll(embs.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"),
        (x, i) => when(i === 0, x + lit(0.05f)).otherwise(x)).as("embedding")))
  }

  test("hand-built corpus: near-dup pruned, original and outlier kept") {
    // two near-parallel vectors (cos ≈ 1) + one orthogonal; k=1 puts
    // all three in one cluster, so the prune rule alone decides
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.999f, 0.01f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f))).toDF("id", "vec")
    val out = SemDedup.prune(df, "id", "vec", dims = 3, threshold = 0.95,
        kClusters = 1, iters = 1)
      .orderBy(col("id")).collect()
    assert(out.map(_.getBoolean(3)).toSeq === Seq(false, true, false))
    // the survivor set is the lower-id representative + the outlier
    assert(out.filter(!_.getBoolean(3)).map(_.getLong(0)).toSeq === Seq(1L, 3L))
    // a row with no earlier cluster-mate reports the -2.0 sentinel
    assert(out.head.getDouble(2) === -2.0)
  }

  test("planted +0.05 copies are pruned, originals never are") {
    val out = SemDedup.prune(plantedEmb, "vec_id", "embedding", dims = 64,
      threshold = 0.9, kClusters = 16, iters = 3)
    val planted = out.filter(col("vec_id") >= 1000000L)
    val originals = out.filter(col("vec_id") < 1000000L)
    val nPlanted = planted.count()
    val nPrunedPlanted = planted.filter(col("pruned")).count()
    // recall bound: a boundary pair can land in different clusters
    // (SemDeDup's documented miss mode), but the vast majority prune
    assert(nPrunedPlanted >= (nPlanted * 9) / 10,
      s"only $nPrunedPlanted of $nPlanted planted copies pruned")
    // an original is always the lower id of its planted pair
    assert(originals.filter(col("pruned")).count() === 0)
  }

  test("deterministic across runs") {
    def run() = SemDedup.prune(plantedEmb, "vec_id", "embedding", dims = 64,
      threshold = 0.9, kClusters = 16, iters = 3)
    assert(run().exceptAll(run()).isEmpty)
  }

  test("autoK scales the cluster count with the corpus") {
    // floor: tiny corpora stay at the oracle default
    assert(IvfIndex.autoK(100, targetClusterSize = 4096) === 16)
    assert(IvfIndex.autoK(16 * 4096, targetClusterSize = 4096) === 16)
    // a 10x corpus gets ~10x the clusters once past the floor
    val k1 = IvfIndex.autoK(1000000, targetClusterSize = 4096)
    val k10 = IvfIndex.autoK(10000000, targetClusterSize = 4096)
    assert(k1 === 245 && k10 === 2442, s"got $k1 / $k10")
    // cap: the centroid plan literal stays broadcast-sized
    assert(IvfIndex.autoK(Long.MaxValue, targetClusterSize = 1) === 65536)
  }

  test("pruneAuto picks a larger k on a larger corpus and bounds per-cluster pairs") {
    // synthetic spread-out corpus: deterministic pseudo-random unit-ish
    // vectors, so k-means has real structure to split
    def corpus(n: Int) = spark.range(n).selectExpr("id",
      "transform(sequence(0, 7), i -> cast(pmod(hash(id * 31 + i), 1000) / 500.0 - 1.0 AS FLOAT)) AS vec")
    val small = corpus(512)
    val big = corpus(5120)
    val target = 256L
    val kSmall = IvfIndex.autoK(512, target)   // floor: 16
    val kBig = IvfIndex.autoK(5120, target)    // 20 > floor
    assert(kSmall === 16 && kBig === 20)
    // the auto path must agree exactly with the fixed-k path at that k
    val auto = SemDedup.pruneAuto(big, "id", "vec", dims = 8,
      threshold = 0.95, targetClusterSize = target)
    val fixed = SemDedup.prune(big, "id", "vec", dims = 8,
      threshold = 0.95, kClusters = kBig)
    assert(auto.exceptAll(fixed).isEmpty && fixed.exceptAll(auto).isEmpty)
    // per-cluster pair counts stay bounded: no cluster collapses into a
    // corpus-sized quadratic blob (generous 8x slack over the target)
    val sizes = auto.groupBy(col("cluster")).count().collect().map(_.getLong(1))
    assert(sizes.length === kBig)
    assert(sizes.max <= target * 8,
      s"giant cluster of ${sizes.max} rows at target $target")
    small.unpersist(); big.unpersist()
  }

  test("pruneAuto sample-capped training: full-corpus output, deterministic, duplicates still pruned") {
    // a tiny trainSampleCap forces the sampled-training path that
    // production hits past ~65k vectors (round-14 1000x finding: full-
    // corpus Lloyd's at auto-k is O(n^2/target) per iteration)
    def base(n: Int) = spark.range(n).selectExpr("id",
      "transform(sequence(0, 7), i -> cast(pmod(hash(id * 31 + i), 1000) / 500.0 - 1.0 AS FLOAT)) AS vec")
    // plant exact duplicates of the first 20 vectors at high ids: a
    // duplicate assigns to the same cluster as its original regardless
    // of which centroids the sample produced, so it MUST be pruned
    val dups = base(20).selectExpr("id + 1000000 AS id", "vec")
    val corpus = base(2000).union(dups)
    val out = SemDedup.pruneAuto(corpus, "id", "vec", dims = 8,
      threshold = 0.999, targetClusterSize = 256L, trainSampleCap = 64L)
      .cache()
    // one verdict row per input vector, sampled training notwithstanding
    assert(out.count() === 2020)
    // every planted duplicate is pruned (cosine 1.0 to an earlier mate)
    val prunedDups = out.filter(col("id") >= 1000000 && col("pruned")).count()
    assert(prunedDups === 20, s"only $prunedDups of 20 duplicates pruned")
    // deterministic: the sampled path has no RNG or order dependence
    val again = SemDedup.pruneAuto(corpus, "id", "vec", dims = 8,
      threshold = 0.999, targetClusterSize = 256L, trainSampleCap = 64L)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    // below the cap the path is bit-identical to unsampled (oracle
    // safety: every driver-SF corpus sits below the default cap)
    val sampled = SemDedup.pruneAuto(base(512), "id", "vec", dims = 8,
      threshold = 0.95, targetClusterSize = 256L, trainSampleCap = 100000L)
    val unsampled = SemDedup.prune(base(512), "id", "vec", dims = 8,
      threshold = 0.95, kClusters = 16)
    assert(sampled.exceptAll(unsampled).isEmpty
      && unsampled.exceptAll(sampled).isEmpty)
    out.unpersist()
  }
}
