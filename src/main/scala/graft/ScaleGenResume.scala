package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Resume a partially-written [[ScaleGen]] output: (re)writes only the
  * tables missing from `outDir`, with the same generators and
  * partition sizing — exists because a factor-1000 run that dies in
  * the events pass (the largest write) should not pay the 20-minute
  * documents pass again. Usage mirrors ScaleGen. */
object ScaleGenResume {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleGenResume <srcSfDir> <outDir> [factor] [mode]")
    val (srcDir, outDir) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    val mode = if (args.length > 3) args(3) else "heaps"
    val spark = graft.core.Sessions.local("graft-scalegen-resume")
    val parts = math.max(32, 32 * factor / 100)
    def missing(name: String): Boolean =
      !Files.exists(Paths.get(s"$outDir/$name.parquet/_SUCCESS"))
    if (missing("documents")) {
      val srcDocs = graft.core.Tables.documents(spark, srcDir)
      (if (mode == "heaps") ScaleGen.scaleDocumentsHeaps(spark, srcDocs, factor)
       else ScaleGen.scaleDocuments(spark, srcDocs, factor))
        .repartition(parts).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    } else println(s"[scalegen-resume] documents present, skipping")
    if (missing("embeddings")) {
      val srcEmbs = graft.core.Tables.embeddings(spark, srcDir)
      (if (mode == "heaps") ScaleGen.scaleEmbeddingsScattered(srcEmbs, factor)
       else ScaleGen.scaleEmbeddings(srcEmbs, factor))
        .repartition(parts).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    } else println(s"[scalegen-resume] embeddings present, skipping")
    if (missing("events")) {
      ScaleGen.scaleEvents(graft.core.Tables.events(spark, srcDir), factor)
        .repartition(parts).write.mode("overwrite").parquet(s"$outDir/events.parquet")
    } else println(s"[scalegen-resume] events present, skipping")
    // small tables are ALWAYS re-copied, via temp + atomic rename (r17
    // advice): the old exists-gate trusted a bare Files.copy target, but
    // a run killed mid-copy leaves a truncated parquet the next resume
    // would treat as complete — unlike the scaled tables, which are
    // correctly gated on _SUCCESS. Re-copying is cheap (single files).
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach { t =>
        val tmp = Paths.get(s"$outDir/.$t.parquet.tmp")
        Files.copy(Paths.get(s"$srcDir/$t.parquet"), tmp,
          StandardCopyOption.REPLACE_EXISTING)
        Files.move(tmp, Paths.get(s"$outDir/$t.parquet"),
          StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      }
    println(s"[scalegen-resume] completed ${factor}x ($mode) of $srcDir in $outDir")
    spark.stop()
  }
}
