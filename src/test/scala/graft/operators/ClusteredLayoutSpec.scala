package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The layout operators actually LAYING OUT data: clusteredWrite must
  * produce a table whose rectangle reads are partition-pruned and
  * touch strictly fewer files than an unclustered copy — the "query
  * reads 2% of row groups" claim of Layout's scaladoc, proved on disk
  * instead of asserted in a comment (the AnnIndexSpec partition-
  * pruning pattern applied to z/hilbert clustering). */
class ClusteredLayoutSpec extends SparkSpec {

  /** 40k deterministic pseudo-uniform points in the unit square. */
  private def points: DataFrame =
    spark.range(40000).select(col("id"),
      (pmod(hash(col("id") * 2 + 1), lit(10000)) / 10000.0).as("x"),
      (pmod(hash(col("id") * 3 + 7), lit(10000)) / 10000.0).as("y"))

  private def scansOf(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = {
    val here = p match { case f: FileSourceScanExec => Seq(f); case _ => Seq.empty }
    val inner = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => scansOf(s.plan)
      case _ => Seq.empty
    }
    here ++ inner ++ p.children.flatMap(scansOf)
  }

  private def filesRead(df: DataFrame): Long = {
    df.collect()
    val scans = scansOf(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, "no file scan in plan")
    scans.map { s =>
      val m = s.metrics.getOrElse("numFiles",
        fail("FileSourceScanExec has no numFiles metric"))
      m.value
    }.sum
  }

  private def checkClustered(useHilbert: Boolean): Unit = {
    val base = Files.createTempDirectory("layout").toString
    val clustered = s"$base/clustered"
    val flat = s"$base/flat"
    val layout = Layout.clusteredWrite(points, "x", "y", clustered,
      useHilbert = useHilbert, bits = 8, partBits = 4)
    points.repartition(16).write.parquet(flat)

    // a 0.2 x 0.2 rectangle — 4% of the space
    val (xLo, xHi, yLo, yHi) = (0.1, 0.3, 0.4, 0.6)
    val pruned = Layout.prunedRead(spark, clustered, layout,
      "x", "y", xLo, xHi, yLo, yHi)
    val baseline = spark.read.parquet(flat)
      .where(col("x").between(xLo, xHi) && col("y").between(yLo, yHi))

    // identical answers: pruning only changes what the scan touches
    val got = pruned.select(col("id")).collect().map(_.getLong(0)).sorted
    val want = baseline.select(col("id")).collect().map(_.getLong(0)).sorted
    assert(got.nonEmpty && got.sameElements(want),
      s"pruned read changed the answer: ${got.length} vs ${want.length} rows")

    // the pruned plan carries partition filters on _zpart
    pruned.collect()
    val scans = scansOf(pruned.queryExecution.executedPlan)
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty),
      "clustered read must be partition-pruned")

    // and touches strictly fewer files than the table has, while the
    // unclustered baseline reads every one of its files
    val totalClustered = spark.read.parquet(clustered).inputFiles.length.toLong
    val touchedClustered = filesRead(pruned)
    val totalFlat = spark.read.parquet(flat).inputFiles.length.toLong
    val touchedFlat = filesRead(baseline)
    assert(touchedFlat == totalFlat,
      s"unclustered filter should scan all files ($touchedFlat of $totalFlat)")
    assert(touchedClustered < totalClustered,
      s"clustered read not pruned: $touchedClustered of $totalClustered files")
    assert(touchedClustered.toDouble / totalClustered <= 0.5,
      s"pruning too weak: $touchedClustered of $totalClustered files for a 4% rectangle")
  }

  test("z-order clusteredWrite prunes rectangle reads (fewer files than flat layout)") {
    checkClustered(useHilbert = false)
  }

  test("hilbert clusteredWrite prunes rectangle reads (fewer files than flat layout)") {
    checkClustered(useHilbert = true)
  }

  test("row groups cover tight curve ranges: _zv is sorted within every file") {
    val base = Files.createTempDirectory("layout_sorted").toString
    Layout.clusteredWrite(points, "x", "y", s"$base/t", bits = 8, partBits = 4)
    val perFile = spark.read.parquet(s"$base/t")
      .select(col("_zv"), input_file_name().as("f"))
    // files partition the curve: per-file [min,max] ranges must not
    // overlap across files within the same _zpart directory
    val ranges = perFile.groupBy(col("f"))
      .agg(min(col("_zv")).as("lo"), max(col("_zv")).as("hi"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byDir = ranges.groupBy(_._1.replaceAll("/[^/]+$", ""))
    byDir.values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      sorted.zip(sorted.tail).foreach { case ((fa, _, hiA), (fb, loB, _)) =>
        assert(hiA <= loB, s"overlapping curve ranges between $fa and $fb")
      }
    }
  }

  test("readLayout restores the persisted metadata bit-for-bit; pruning works cross-session") {
    val base = Files.createTempDirectory("layout_meta").toString
    val written = Layout.clusteredWrite(points, "x", "y", s"$base/t",
      useHilbert = true, bits = 8, partBits = 4)
    val restored = Layout.readLayout(s"$base/t")
    assert(restored === written)
    // a reader holding ONLY the restored metadata gets the same answer
    val viaRestored = Layout.prunedRead(spark, s"$base/t", restored,
      "x", "y", 0.1, 0.3, 0.4, 0.6).select(col("id"))
      .collect().map(_.getLong(0)).sorted
    val viaWritten = Layout.prunedRead(spark, s"$base/t", written,
      "x", "y", 0.1, 0.3, 0.4, 0.6).select(col("id"))
      .collect().map(_.getLong(0)).sorted
    assert(viaRestored.sameElements(viaWritten) && viaRestored.nonEmpty)
    // the metadata file is invisible to the parquet scan
    assert(spark.read.parquet(s"$base/t").count() === 40000L)
    intercept[IllegalArgumentException] {
      Layout.readLayout(Files.createTempDirectory("not_a_table").toString)
    }
  }

  test("clusteredWrite rejects reserved columns and degenerate inputs") {
    intercept[IllegalArgumentException] {
      Layout.clusteredWrite(points.withColumn("_zv", lit(1L)), "x", "y",
        Files.createTempDirectory("bad").toString + "/t")
    }
    intercept[IllegalArgumentException] {
      Layout.clusteredWrite(points.where(lit(false)), "x", "y",
        Files.createTempDirectory("empty").toString + "/t")
    }
  }
}
