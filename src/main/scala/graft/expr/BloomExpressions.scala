package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_contains(hash BIGINT, sketch BINARY) → BOOLEAN` —
  * membership probe against a serialized [[BloomFilter]] sketch
  * (`org.apache.spark.util.sketch`, the public API behind
  * `df.stat.bloomFilter`). The sketch argument must be a literal: it is
  * deserialized ONCE (driver side at codegen, lazily per executor in the
  * interpreted path) and probed per row with `mightContainLong` — the
  * probe is a couple of XORs + bit tests inside whole-stage codegen, so
  * a 100 TB n-gram stream pays no join and no shuffle to be prefiltered
  * against a few-MB sketch. False positives are possible (callers must
  * exact-verify survivors); false negatives are not.
  *
  * The hash side is expected to be `xxhash64(value)` — the same column
  * expression used when the sketch was built over longs, so build and
  * probe agree bit-for-bit. */
case class BloomContainsLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, BinaryType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (LongType, BinaryType) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_bloom_contains: sketch must be a literal (broadcast one sketch, not one per row)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains requires (bigint, binary), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(right.eval(null).asInstanceOf[Array[Byte]])

  override protected def nullSafeEval(hash: Any, sketch: Any): Any =
    filter.mightContainLong(hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (h, _) =>
      s"${ev.value} = $ref.mightContainLong($h);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContainsLong =
    copy(left = newLeft, right = newRight)
}
