package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.Comparator

/** Regenerates the golden expected-output parquet files for the four
  * hash-based queries whose semantics are not DuckDB-expressible
  * (xxhash64 MinHash/SimHash signatures, seeded random-hyperplane LSH):
  * t07/t08/t12/t13. Their outputs ARE fully deterministic — fixed hash
  * primitives, seeded hyperplanes, explicit ORDER BY with unique
  * tiebreaks — so a reviewed precomputed parquet is a valid oracle, the
  * same way u01/u02 gate the UDBF reader with closed-form literals. The
  * driver's DuckDB side then reads the golden via `read_parquet` and
  * hash-compares as usual.
  *
  * MUST be regenerated (and the diff reviewed — planted pairs present,
  * row counts plausible) whenever the detectors' hash/LSH parameters
  * change. Generated at the driver's verify scale factor (sf0.01):
  *   sbt "runMain graft.GoldenGen /root/testdata/sf0.01 /root/repo/golden"
  */
object GoldenGen {

  /** The queries gated by golden files, with their repo-committed paths. */
  val goldenQueries: Seq[String] = Seq(
    "t07_minhash_neardup", "t08_simhash_neardup",
    "t12_ann_lsh_topk", "t13_embedding_neardup", "t25_ivf_topk")

  def goldenPath(name: String): String = s"/root/repo/golden/$name.parquet"

  /** args: [sfDir] [outDir] [queryName...] — with no names, regenerates
    * every golden (name filtering avoids byte-churn on untouched files). */
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "/root/repo/golden"
    val names = if (args.length > 2) args.drop(2).toSeq else goldenQueries
    require(names.forall(goldenQueries.contains),
      s"unknown golden query in ${names.mkString(",")}")
    val spark = graft.core.Sessions.local("graft-golden")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val tmp = Paths.get(outDir, s"__tmp_$name")
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp)
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().orElseThrow(() =>
          new IllegalStateException(s"no parquet part written for $name"))
      Files.move(part, Paths.get(outDir, s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Files.walk(tmp).sorted(Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.delete(p))
      println(s"[golden] wrote $outDir/$name.parquet")
    }
    spark.stop()
  }
}
