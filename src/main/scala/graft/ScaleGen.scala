package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the LLM-pipeline tables
  * (documents / embeddings / events) for scaling-decade probes — the
  * committed, seeded generator behind PLANS.md's "measured scaling"
  * tables. NOT part of the correctness gate: the driver's corpora stay
  * authoritative; this exists so further decades (sf0.1 → 10× → 100×
  * → 1000×) can be measured on demand without touching /root/testdata.
  *
  * Copy discipline (copy 0 is the original rows, ids preserved):
  *   - documents: copy k re-SAMPLES each document's tokens from the
  *     corpus vocabulary with xxhash64(k, doc_id, position) — same
  *     vocabulary, same per-doc length, fresh iid draws — so the
  *     scaled corpus has the generator's own density character
  *     instead of planted 10-cliques (verbatim copies would hand the
  *     near-dup detectors a quadratic answer that says nothing about
  *     scaling). lang/source ride along; n_chars recomputed.
  *   - embeddings: copy k cyclically shifts the vector by k positions,
  *     composed with a per-component sign flip keyed by the rotation
  *     GROUP g = k div dims (g = 0 flips nothing, so factors ≤ dims
  *     reproduce the historical pure-rotation corpus bit for bit).
  *     Both steps are isometries, so norms, label cluster structure,
  *     and the IVF regime survive while cross-copy cosines scatter
  *     like unrelated vectors. The flip is what makes factors past
  *     dims honest: rotation alone has period dims, so copy k and
  *     copy k+dims would be IDENTICAL vectors — an artificial
  *     exact-duplicate family that hands the embedding near-dup
  *     detectors a fake quadratic answer (this bug shaped the first
  *     100× embedding measurements; PLANS.md records the remeasure).
  *   - events: copy k shifts event_id by k·10⁹ and user_id by k·10⁵ —
  *     factor× users over the same time range, so per-user session
  *     shapes hold while windows carry factor× rows (the honest
  *     growth axis for the windowed/stateful queries).
  *
  * All three are ONE plan regardless of factor: the copy index is an
  * exploded `sequence(0, factor-1)` column, not a factor-way union —
  * a 1000-way union is itself a scale defect (plan size and analysis
  * time linear in factor, codegen fallback), and the explode form is
  * value-identical (ScaleGenSpec pins parity against a literal
  * union-form reference).
  *
  * The TPC-H-ish tables are byte-copied verbatim (the decade probe
  * targets the pipeline tables; relational queries then run unchanged
  * inputs and serve as the fixed-cost control group).
  *
  * Usage: runMain graft.ScaleGen <srcSfDir> <outDir> [factor]
  */
object ScaleGen {

  /** Exploded copy index 0..factor-1 as an IntegerType column named
    * `__k` (IntegerType is load-bearing: xxhash64 hashes Int and Long
    * differently, and the historical union form seeded with an Int
    * literal). */
  private def withCopyIndex(src: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    src.withColumn("__k", explode(sequence(lit(0), lit(factor - 1))))
  }

  def scaleDocuments(spark: SparkSession, src: DataFrame, factor: Int): DataFrame = {
    val vocab = graft.core.Bounded.collect(
      src.select(explode(split(trim(col("text")), "\\s+")).as("w"))
        .where(length(col("w")) > 0).distinct(), 1 << 16, "ScaleGen.vocab")
      .map(_.getString(0)).sorted
    val vLit = typedLit(vocab)
    val n = lit(vocab.length)
    val k = col("__k")
    val nTok = size(split(trim(col("text")), "\\s+"))
    val fresh = array_join(
      transform(sequence(lit(1), nTok), j =>
        element_at(vLit,
          (pmod(xxhash64(k, col("doc_id"), j), n) + 1).cast("int"))),
      " ")
    withCopyIndex(src, factor).select(
      (col("doc_id") + k.cast("long") * lit(10000000L)).as("doc_id"),
      when(k === 0, col("text")).otherwise(fresh).as("text"),
      col("lang"), col("source"),
      when(k === 0, col("n_chars"))
        .otherwise(length(fresh).cast("long")).as("n_chars"))
  }

  def scaleEmbeddings(src: DataFrame, factor: Int): DataFrame = {
    val k = col("__k")
    val dims = size(col("embedding"))
    // rotation group: which full wrap of the cyclic shift k is in
    val g = floor(k.cast("double") / dims.cast("double")).cast("int")
    val rotated = transform(sequence(lit(0), dims - 1), i => {
      val e = element_at(col("embedding"), (pmod(i + k, dims) + 1).cast("int"))
      // sign flip keyed by (group, output position); group 0 = identity
      // so every historical factor ≤ dims corpus is reproduced verbatim
      val sign = (pmod(xxhash64(g, i), lit(2)).cast("int") * lit(2) - lit(1)).cast("float")
      when(g === 0, e).otherwise(e * sign).cast("float")
    })
    withCopyIndex(src, factor).select(
      (col("vec_id") + k.cast("long") * lit(10000000L)).as("vec_id"),
      when(k === 0, col("embedding")).otherwise(rotated).as("embedding"),
      col("label"))
  }

  def scaleEvents(src: DataFrame, factor: Int): DataFrame = {
    val k = col("__k")
    withCopyIndex(src, factor).select(
      (col("event_id") + k.cast("long") * lit(1000000000L)).as("event_id"),
      col("ts"),
      (col("user_id") + k.cast("long") * lit(100000L)).as("user_id"),
      col("event_type"), col("value"), col("props"))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleGen <srcSfDir> <outDir> [factor]")
    val (srcDir, outDir) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    require(factor >= 1 && factor <= 10000)
    val spark = graft.core.Sessions.local("graft-scalegen")
    Files.createDirectories(Paths.get(outDir))

    // partition count scales with output size so no single write task
    // owns gigabytes (factor 10 → 32 partitions, factor 1000 → 320)
    val parts = math.max(32, 32 * factor / 100)
    scaleDocuments(spark, graft.core.Tables.documents(spark, srcDir), factor)
      .repartition(parts).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    scaleEmbeddings(graft.core.Tables.embeddings(spark, srcDir), factor)
      .repartition(parts).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    scaleEvents(graft.core.Tables.events(spark, srcDir), factor)
      .repartition(parts).write.mode("overwrite").parquet(s"$outDir/events.parquet")

    // control group: relational tables verbatim
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach { t =>
        Files.copy(Paths.get(s"$srcDir/$t.parquet"),
          Paths.get(s"$outDir/$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
      }
    println(s"[scalegen] wrote ${factor}x of $srcDir to $outDir")
    spark.stop()
  }
}
