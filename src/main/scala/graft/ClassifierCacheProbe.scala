package graft

import org.apache.spark.sql.functions._

/** Full-batch training iteration-cost probe for t57 (r18 verdict
  * item 6): [[graft.operators.Classifier]] runs 15 full-batch gradient
  * iterations over the hashed-feature frame — the only ≥ 7 s bench
  * query whose engine arm does strictly repeated work. The trainer
  * persists that frame by default (`cache = true`, MEMORY_AND_DISK);
  * this probe measures what that persist is worth by training twice —
  * cached vs re-scan (`trainMiniBatch` with `sample = 1`, which is
  * spec-pinned bit-identical to `train`) — and asserts the weight
  * vectors are EXACTLY equal, so the knob is pure I/O posture, never
  * answer. `cache = false` remains the documented 100 TB posture for
  * t104's mini-batch path (a feature-frame cache that spills-and-
  * thrashes loses to re-scanning 1/sample slices); t57's full-batch
  * shape is the one that repays the persist, and this row is the
  * committed number behind that adjudication.
  *
  * Usage: runMain graft.ClassifierCacheProbe [sfDir]
  */
object ClassifierCacheProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = graft.core.Sessions.local("graft-classifier-cache-probe")
    import graft.GoldenGen.ModelParams._

    val docs = graft.core.Tables.documents(spark, sfDir)
    val label = col("source").isin("src0", "src1")
    def f2(d: Double) = math.round(d * 100.0) / 100.0

    def trainTimed(cache: Boolean): (Seq[Double], Double) = {
      val t0 = System.nanoTime()
      val w = graft.operators.Classifier.trainMiniBatch(docs, "text", label,
        idCol = col("doc_id"), dims = LrDims, iters = LrIters, lr = LrRate,
        roundDp = LrRoundDp, sample = 1, cache = cache)
      (w, f2((System.nanoTime() - t0) / 1e9))
    }
    // warm the parquet footers / JIT outside both timed arms
    docs.count()
    val (wCold, wallRescan) = trainTimed(cache = false)
    val (wWarm, wallCached) = trainTimed(cache = true)
    require(wCold == wWarm,
      "cache knob changed the weights — the determinism contract is broken")
    val n = docs.count()
    println(s"""{"metric":"classifier_cache_probe","sf":"$sfDir","n":$n,"iters":$LrIters,"wall_rescan_s":$wallRescan,"wall_cached_s":$wallCached,"speedup":${f2(wallRescan / wallCached)},"weights_identical":true}""")
    spark.stop()
  }
}
