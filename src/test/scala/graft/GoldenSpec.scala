package graft

import org.apache.spark.sql.functions._

/** The golden-parquet oracle gate, re-derived on every test run: each of
  * the four hash-based queries (t07/t08/t12/t13) must reproduce its
  * committed golden file EXACTLY on the corpus it was generated from
  * (the driver's verify SF, sf0.01). Catches detector-parameter or hash
  * drift before the driver's DuckDB compare would — a golden that needs
  * to change must be regenerated deliberately via [[GoldenGen]]. */
class GoldenSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  GoldenGen.goldenQueries.foreach { name =>
    test(s"$name reproduces its golden file bit-for-bit at sf0.01") {
      val golden = GoldenGen.goldenPath(name)
      assert(new java.io.File(golden).isFile, s"missing golden $golden")
      val live = SparkEntry.queries(name)(spark, sfDir)
      val expected = spark.read.parquet(golden)
      assert(live.schema.map(f => (f.name, f.dataType)) ===
        expected.schema.map(f => (f.name, f.dataType)), "schema drift")
      // exact multiset equality, both directions
      assert(live.exceptAll(expected).isEmpty &&
        expected.exceptAll(live).isEmpty,
        s"$name output drifted from $golden — if the change is " +
          "intentional, regenerate via `runMain graft.GoldenGen`")
    }
  }

  test("golden oracle SQL entries point at the committed files") {
    GoldenGen.goldenQueries.foreach { name =>
      val sql = SparkEntry.oracleSql.getOrElse(name,
        fail(s"$name has no oracle entry"))
      assert(sql.contains(GoldenGen.goldenPath(name)),
        s"$name oracle does not read its golden file")
    }
  }
}
