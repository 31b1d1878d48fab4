package graft

/** The driver contract itself: the flagship smoke query, name
  * uniqueness (a duplicate QueryDef name would silently shadow a query
  * in the toMap and the driver's correctness file would shrink without
  * a failure), and the full-oracle invariant. */
class SparkEntrySpec extends SparkSpec {

  test("entry() (the driver's smoke check) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query names are unique — a duplicate would silently shadow in toMap") {
    val names = SparkEntry.defs.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    assert(SparkEntry.queries.size === names.size)
  }

  test("every declared query carries a FULL SQL oracle (no rows-only checks)") {
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet)
  }

  test("query names follow the family naming scheme") {
    val pat = "^(q|r|t|u)\\d{2,3}_[a-z0-9_]+$".r
    val bad = SparkEntry.queries.keys.filterNot(n => pat.matches(n))
    assert(bad.isEmpty, s"non-conforming names: ${bad.mkString(", ")}")
  }
}
