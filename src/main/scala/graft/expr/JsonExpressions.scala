package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Strict whole-input JSON validation — `json.loads` semantics: the
  * input must be EXACTLY one JSON value with nothing but the value in
  * it. Spark's own `try_parse_json` stops after the first complete
  * value and tolerates trailing garbage (`{"a":1}x` parses), which is
  * the wrong admission semantics for a webhook gate mirroring a strict
  * deserializer (`sevenio/app.py:58` json.loads). Built-ins cannot
  * express "and the parser consumed everything", so this is one of the
  * few places the engine needs a custom Expression rather than a
  * composition. */
object JsonStrict {
  // json.loads accepts the non-standard NaN/Infinity/-Infinity literals
  // by default; Jackson rejects them unless asked — enable for parity
  private val factory = new com.fasterxml.jackson.core.JsonFactoryBuilder()
    .enable(com.fasterxml.jackson.core.json.JsonReadFeature.ALLOW_NON_NUMERIC_NUMBERS)
    .build()

  /** json.loads accepts exactly these non-numeric literal spellings;
    * Jackson's ALLOW_NON_NUMERIC_NUMBERS additionally accepts +INF,
    * -INF and +Infinity, which must be rejected for parity. Numeral
    * overflow ("1e999" → inf) is NOT a literal and stays accepted —
    * json.loads parses it too. */
  private val PyNonFinite = Set("NaN", "Infinity", "-Infinity")

  def isStrict(text: UTF8String): Boolean = {
    import com.fasterxml.jackson.core.JsonToken._
    try {
      val p = factory.createParser(text.toString)
      try {
        var tok = p.nextToken()
        if (tok == null) return false // empty input
        // walk the first value token-by-token (not skipChildren) so each
        // non-finite literal's spelling can be vetted
        var depth = 0
        var first = true
        while (first || depth > 0) {
          first = false
          tok match {
            case START_OBJECT | START_ARRAY => depth += 1
            case END_OBJECT | END_ARRAY => depth -= 1
            case _ =>
              // json.loads parity for numeric overflow ('1e999' accepted)
              // leans on Jackson's LAZY number decoding: isNaN() is false
              // for a textual numeral whose double value was never
              // materialized, so only explicit NaN/Infinity literals
              // reach the PyNonFinite spelling check. A Jackson upgrade
              // that eagerly materializes doubles would flip '1e999' to
              // rejected — WebhookGateSpec's truth table pins the case.
              if (p.isNaN && !PyNonFinite.contains(p.getText)) return false
          }
          if (depth > 0) {
            tok = p.nextToken()
            if (tok == null) return false // truncated container
          }
        }
        p.nextToken() == null // nothing may follow the first value
      } finally p.close()
    } catch {
      case _: java.io.IOException => false
      case _: RuntimeException => false
    }
  }
}

/** `graft_json_strict(text)` → boolean: true iff the text is exactly
  * one complete JSON value (strict-deserializer admission semantics).
  * Null text → null. */
case class GraftJsonStrict(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_json_strict requires a string column, got ${dt.sql}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_json_strict"

  override protected def nullSafeEval(text: Any): Any =
    JsonStrict.isStrict(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expr.JsonStrict.isStrict($t)")

  override protected def withNewChildInternal(newChild: Expression): GraftJsonStrict =
    copy(child = newChild)
}
