package graft

import org.apache.spark.sql.functions._

/** The golden-parquet oracle gate, re-derived on every test run: each of
  * the five hash/LSH/k-means queries (t07/t08/t12/t13/t25) must
  * reproduce its committed golden file EXACTLY at every verify scale
  * factor goldens exist for. Catches detector-parameter or hash drift
  * before the driver's DuckDB compare would — a golden that needs to
  * change must be regenerated deliberately via [[GoldenGen]]. */
class GoldenSpec extends SparkSpec {

  GoldenGen.sfTags.foreach { case (sfTag, _) =>
    GoldenGen.goldenQueries.foreach { name =>
      test(s"$name reproduces its $sfTag golden bit-for-bit") {
        val golden = GoldenGen.goldenPath(sfTag, name)
        assert(new java.io.File(golden).isFile, s"missing golden $golden")
        val live = SparkEntry.queries(name)(spark, s"/root/testdata/$sfTag")
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
  }

  test("golden oracle SQL selects per-SF goldens by corpus size") {
    GoldenGen.goldenQueries.foreach { name =>
      val sql = SparkEntry.oracleSql.getOrElse(name,
        fail(s"$name has no oracle entry"))
      GoldenGen.sfTags.foreach { case (sfTag, nCust) =>
        assert(sql.contains(GoldenGen.goldenPath(sfTag, name)),
          s"$name oracle does not read its $sfTag golden")
        assert(sql.contains(s"= $nCust"),
          s"$name oracle does not guard on the $sfTag corpus size")
      }
    }
  }
}
