package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic 10× scale-up of the LLM-pipeline tables
  * (documents / embeddings / events) for scaling-decade probes — the
  * committed, seeded generator behind PLANS.md's "measured scaling"
  * tables. NOT part of the correctness gate: the driver's corpora stay
  * authoritative; this exists so a second decade (sf0.1 → 10×) can be
  * measured on demand without touching /root/testdata.
  *
  * Copy discipline (copy 0 is the original rows, ids preserved):
  *   - documents: copy k re-SAMPLES each document's tokens from the
  *     corpus vocabulary with xxhash64(k, doc_id, position) — same
  *     vocabulary, same per-doc length, fresh iid draws — so the
  *     scaled corpus has the generator's own density character
  *     instead of planted 10-cliques (verbatim copies would hand the
  *     near-dup detectors a quadratic answer that says nothing about
  *     scaling). lang/source ride along; n_chars recomputed.
  *   - embeddings: copy k cyclically shifts the vector by k positions —
  *     an isometry, so norms, label cluster structure, and the IVF
  *     regime survive, while cross-copy cosines scatter like unrelated
  *     vectors (no artificial near-dup families).
  *   - events: copy k shifts event_id by k·10⁹ and user_id by k·10⁵ —
  *     10× users over the same time range, so per-user session shapes
  *     hold while windows carry 10× rows (the honest growth axis for
  *     the windowed/stateful queries).
  *
  * The TPC-H-ish tables are byte-copied verbatim (the decade probe
  * targets the pipeline tables; relational queries then run unchanged
  * inputs and serve as the fixed-cost control group).
  *
  * Usage: runMain graft.ScaleGen <srcSfDir> <outDir> [factor]
  */
object ScaleGen {

  def scaleDocuments(spark: SparkSession, src: DataFrame, factor: Int): DataFrame = {
    val vocab = graft.core.Bounded.collect(
      src.select(explode(split(trim(col("text")), "\\s+")).as("w"))
        .where(length(col("w")) > 0).distinct(), 1 << 16, "ScaleGen.vocab")
      .map(_.getString(0)).sorted
    val vLit = typedLit(vocab)
    val n = lit(vocab.length)
    (0 until factor).map { k =>
      if (k == 0) src
      else {
        val nTok = size(split(trim(col("text")), "\\s+"))
        val fresh = array_join(
          transform(sequence(lit(1), nTok), j =>
            element_at(vLit,
              (pmod(xxhash64(lit(k), col("doc_id"), j), n) + 1).cast("int"))),
          " ")
        src.select(
          (col("doc_id") + lit(k.toLong * 10000000L)).as("doc_id"),
          fresh.as("text"), col("lang"), col("source"),
          length(fresh).cast("long").as("n_chars"))
      }
    }.reduce(_.unionAll(_))
  }

  def scaleEmbeddings(src: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { k =>
      if (k == 0) src
      else {
        val dims = size(col("embedding"))
        src.select(
          (col("vec_id") + lit(k.toLong * 10000000L)).as("vec_id"),
          transform(sequence(lit(0), dims - 1), i =>
            element_at(col("embedding"), (pmod(i + lit(k), dims) + 1).cast("int")))
            .as("embedding"),
          col("label"))
      }
    }.reduce(_.unionAll(_))

  def scaleEvents(src: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { k =>
      if (k == 0) src
      else src.select(
        (col("event_id") + lit(k.toLong * 1000000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(k.toLong * 100000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_.unionAll(_))

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleGen <srcSfDir> <outDir> [factor]")
    val (srcDir, outDir) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    require(factor >= 1 && factor <= 100)
    val spark = graft.core.Sessions.local("graft-scalegen")
    Files.createDirectories(Paths.get(outDir))

    scaleDocuments(spark, graft.core.Tables.documents(spark, srcDir), factor)
      .repartition(32).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    scaleEmbeddings(graft.core.Tables.embeddings(spark, srcDir), factor)
      .repartition(32).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    scaleEvents(graft.core.Tables.events(spark, srcDir), factor)
      .repartition(32).write.mode("overwrite").parquet(s"$outDir/events.parquet")

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
