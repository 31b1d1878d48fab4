package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session keeps
  * the test run fast; suites must not mutate session state). */
object TestSession {
  lazy val spark: SparkSession = graft.core.Sessions
    .builder("graft-test")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    // fresh warehouse per JVM: saveAsTable tests must not collide with
    // leftover ./spark-warehouse state from earlier runs
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .getOrCreate()
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = TestSession.spark
    s.sparkContext.setLogLevel("WARN")
    s
  }
  /** `import testImplicits._` for .toDF/.toDS in suites. */
  protected lazy val testImplicits: org.apache.spark.sql.SQLImplicits =
    spark.implicits
}
