package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, TimestampType}

/** P1 as a native Catalyst expression with Java codegen
  * (SURVEY.md §2.12/§7.4: the one reference transform worth a first-class
  * `Expression`): OLE Automation date — days since 1899-12-30 as a
  * double (what the Gantner decoder emits in matrix column 0,
  * DataConverterUDBF.py:129-140) — to a Spark TIMESTAMP.
  *
  * Registered as SQL function `ole_to_timestamp` by [[GraftExtensions]];
  * the composed-Column equivalent lives in
  * [[graft.functions.ReferenceFunctions.oleToTimestamp]] and the test
  * suite pins the two to identical results. Generated code is a single
  * arithmetic statement inside whole-stage codegen — no virtual call,
  * no boxing. */
case class OleToTimestamp(child: Expression) extends UnaryExpression {

  /** Days between the OLE epoch (1899-12-30) and 1970-01-01. */
  private val OleEpochDays = 25569.0d

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ole_to_timestamp requires DOUBLE input, got ${child.dataType.sql}")
  override def dataType: DataType = TimestampType
  override def prettyName: String = "ole_to_timestamp"

  override def nullSafeEval(input: Any): Any = {
    val ole = input.asInstanceOf[Double]
    Math.round((ole - OleEpochDays) * 86400e6)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"java.lang.Math.round(($c - 25569.0d) * 86400000000.0d)")

  override protected def withNewChildInternal(newChild: Expression): OleToTimestamp =
    copy(child = newChild)
}
