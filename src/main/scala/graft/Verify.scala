package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg (dev only; the driver passes two): run just the
    // named comma-separated queries — single-query oracle iteration
    // without a 171-query dump
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    // the one engine session config (AQE, UTC, extensions, broadcast
    // threshold) — correctness and bench must run what users run
    val spark = graft.core.Sessions.local("graft-verify")
    new java.io.File(outDir).mkdirs()
    // A query whose write throws must surface as a RED row, not vanish from
    // the manifest: collect every failure and dump errors.json alongside the
    // parquet results so "fewer rows, all green" can never mask a regression.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Checked corpus invariant (FIXTURES.md §9): the paired `\s+`
    // tokenization sites are engine-parity-exact only for \x0B-free text
    // (Java \s includes vertical tab, DuckDB/RE2 \s does not). Assert it
    // here — where the parity is consumed — so corpus drift surfaces as a
    // named red row instead of a silent token-count mismatch.
    try {
      import org.apache.spark.sql.functions.{col, lit}
      val vt = graft.core.Tables.documents(spark, sfDir)
        .where(col("text").contains(lit("\u000B"))).limit(1).count()
      if (vt > 0)
        errors("_corpus_invariant_no_vertical_tab") =
          "documents.text contains \\x0B; Java-vs-RE2 \\s+ tokenization parity is void"
    } catch { case e: Throwable =>
      errors("_corpus_invariant_no_vertical_tab") =
        s"invariant check failed to run: ${e.getMessage}".take(500)
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[verify] $name failed: $msg")
        errors(name) = msg.linesIterator.take(3).mkString(" | ").take(500)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} FAILED: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}
