package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.Comparator

/** Regenerates the golden expected-output parquet files for the five
  * queries whose semantics are not DuckDB-expressible (xxhash64
  * MinHash/SimHash signatures, seeded random-hyperplane LSH, k-means
  * IVF): t07/t08/t12/t13/t25. Their outputs ARE fully deterministic —
  * fixed hash primitives, seeded hyperplanes, deterministic training,
  * explicit ORDER BY with unique tiebreaks — so a reviewed precomputed
  * parquet is a valid oracle, the same way u01/u02 gate the UDBF reader
  * with closed-form literals. The driver's DuckDB side reads the golden
  * via `read_parquet` and hash-compares as usual.
  *
  * Goldens are PER SCALE FACTOR (the corpora differ), committed under
  * `golden/<sfTag>/`; the oracle SQL selects the right one at runtime by
  * branching on `count(*) FROM customer` (150 at sf0.001, 1500 at
  * sf0.01), so the gate is green at either verify SF.
  *
  * MUST be regenerated (and the diff reviewed — planted pairs present,
  * row counts plausible) whenever detector parameters change:
  *   sbt "runMain graft.GoldenGen /root/testdata/sf0.001 /root/repo/golden"
  *   sbt "runMain graft.GoldenGen /root/testdata/sf0.01  /root/repo/golden"
  */
object GoldenGen {

  /** The queries gated by golden files, with their repo-committed paths. */
  val goldenQueries: Seq[String] = Seq(
    "t07_minhash_neardup", "t08_simhash_neardup",
    "t12_ann_lsh_topk", "t13_embedding_neardup", "t25_ivf_topk",
    "t28_semdedup", "t40_pq_topk", "u11_webhook_gate")

  /** The verify SFs goldens exist for, with the `customer` row count the
    * oracle SQL keys on. */
  val sfTags: Seq[(String, Long)] = Seq(
    "sf0.001" -> 150L, "sf0.01" -> 1500L, "sf0.1" -> 15000L)

  /** Root of the committed golden tree. Env-overridable so a relocated
    * repo (or a driver with its own checkout) can point the oracles at
    * the right files instead of silently reading a stale absolute path. */
  def goldenRoot: String =
    sys.env.getOrElse("SPARK_GRAFT_GOLDEN_DIR", "/root/repo/golden")

  def goldenPath(sfTag: String, name: String): String =
    s"$goldenRoot/$sfTag/$name.parquet"

  /** Oracle SQL selecting the golden matching the runtime corpus, with a
    * deterministic outer ordering. A final sentinel branch (schema
    * borrowed from the first golden, rows impossible) raises a DuckDB
    * `error(...)` when the corpus size matches NO golden slot — without
    * it every branch is silently false and an un-goldened SF surfaces as
    * a baffling zero-row hash mismatch instead of a diagnosable failure.
    * The CASE is what defers `error` evaluation to the no-slot case
    * (AND operand order is not guaranteed; CASE branches are). */
  def oracleSql(name: String, orderBy: String): String = {
    val branches = sfTags.map { case (tag, nCust) =>
      s"""SELECT * FROM read_parquet('${goldenPath(tag, name)}')
         |WHERE (SELECT count(*) FROM customer) = $nCust""".stripMargin
    }
    val counts = sfTags.map(_._2).mkString(", ")
    val sentinel =
      s"""SELECT * FROM read_parquet('${goldenPath(sfTags.head._1, name)}')
         |WHERE CASE WHEN (SELECT count(*) FROM customer) IN ($counts) THEN FALSE
         |      ELSE error(concat('no golden slot for corpus size ',
         |                 (SELECT count(*) FROM customer)::VARCHAR)) END""".stripMargin
    (branches :+ sentinel)
      .mkString("SELECT * FROM (\n", "\nUNION ALL\n", s"\n) ORDER BY $orderBy")
  }

  /** args: [sfDir] [outDir] [queryName...] — with no names, regenerates
    * every golden for that SF (name filtering avoids byte-churn on
    * untouched files). */
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "/root/repo/golden"
    val names = if (args.length > 2) args.drop(2).toSeq else goldenQueries
    require(names.forall(goldenQueries.contains),
      s"unknown golden query in ${names.mkString(",")}")
    val sfTag = Paths.get(sfDir).getFileName.toString
    require(sfTags.exists(_._1 == sfTag), s"no golden slot for $sfTag")
    val spark = graft.core.Sessions.local("graft-golden")
    Files.createDirectories(Paths.get(outDir, sfTag))
    names.foreach { name =>
      val tmp = Paths.get(outDir, sfTag, s"__tmp_$name")
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = scala.util.Using.resource(Files.list(tmp)) { files =>
        files.filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().orElseThrow(() =>
            new IllegalStateException(s"no parquet part written for $name"))
      }
      Files.move(part, Paths.get(outDir, sfTag, s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Files.walk(tmp).sorted(Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.delete(p))
      println(s"[golden] wrote $outDir/$sfTag/$name.parquet")
    }
    spark.stop()
  }
}
