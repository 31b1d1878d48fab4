package graft.expr

import graft.SparkSpec
import graft.functions.ReferenceFunctions
import org.apache.spark.sql.functions._

/** The native codegen ole_to_timestamp expression: SQL registration via
  * GraftExtensions, golden values, and equivalence with the
  * composed-Column implementation. */
class OleToTimestampSpec extends SparkSpec {
  import testImplicits._

  test("registered SQL function resolves and evaluates golden anchors") {
    val out = spark.sql(
      """SELECT cast(ole_to_timestamp(25569.0d) AS STRING),
        |       cast(ole_to_timestamp(45366.5d) AS STRING),
        |       ole_to_timestamp(CAST(NULL AS DOUBLE))""".stripMargin).head
    assert(out.getString(0) == "1970-01-01 00:00:00")
    assert(out.getString(1) == "2024-03-15 12:00:00")
    assert(out.isNullAt(2))
  }

  test("expression matches the composed-Column implementation on a range") {
    val df = (0 until 1000).map(i => 25569.0 + i * 37.125).toDF("ole")
    val mismatches = df.select(
      expr("ole_to_timestamp(ole)").as("native"),
      ReferenceFunctions.oleToTimestamp(col("ole")).as("composed"))
      .filter(col("native") =!= col("composed"))
      .count()
    assert(mismatches == 0)
  }

  test("expression participates in whole-stage codegen") {
    // spark.range keeps the input non-foldable, so the expression must
    // go through doGenCode inside a WholeStageCodegen span (a local
    // literal would be constant-folded away before codegen)
    val df = spark.range(1)
      .selectExpr("ole_to_timestamp(cast(id AS DOUBLE) + 45000.25d) AS ts")
    val code = df.queryExecution.debug.codegenToSeq()
    assert(code.nonEmpty)
    assert(code.exists(_._2.contains("86400000000.0d")),
      "generated java should inline the OLE arithmetic")
    assert(df.head.getTimestamp(0).toInstant.toString == "2023-03-15T06:00:00Z")
  }
}
