package graft.sinks

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.DataFrame

/** K1 — single-file CSV write with the reference's exact naming
  * (`<stem>_stats.csv`, header row, no index column —
  * DataConverterUDBF.py:267-278).
  *
  * Spark writes directories of part files; faithful single-file naming
  * needs a post-commit rename (SURVEY.md §7.5.4): coalesce(1) into a
  * temp dir next to the target, move the lone part file onto the target
  * name, drop the temp dir. The rename is atomic on POSIX, mirroring the
  * task-commit trick Spark itself uses. */
object CsvSink {

  def writeSingleCsv(df: DataFrame, target: Path): Unit = {
    Files.createDirectories(target.getParent)
    val tmp = Files.createTempDirectory(target.getParent, ".csv_stage_")
    try {
      df.coalesce(1).write.mode("overwrite").option("header", "true")
        .csv(tmp.toString)
      val part = Files.list(tmp).filter { p =>
        val n = p.getFileName.toString
        n.startsWith("part-") && n.endsWith(".csv")
      }.findFirst().orElseThrow(() =>
        new IllegalStateException(s"no part file written under $tmp"))
      Files.move(part, target,
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    } finally {
      // best-effort cleanup of the staging dir and Spark's marker files
      Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
  }
}
