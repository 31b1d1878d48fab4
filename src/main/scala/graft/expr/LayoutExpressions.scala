package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Hilbert curve xy→d kernel (the classic bit-twiddling formulation,
  * e.g. Hamilton 2006 tech report / Warren, Hacker's Delight ch. 16):
  * walk the square from the top bit down, accumulate the quadrant
  * index, and rotate/reflect the frame per the quadrant's orientation.
  * Pure integer arithmetic on masked inputs — total, deterministic,
  * and replayable as a chained per-bit SQL recurrence (the t95
  * oracle), which is also why the engine side is a native kernel: the
  * rotation feeds x/y of level k into level k−1 TWICE, so an unrolled
  * Column tree grows exponentially in `bits` while this loop is O(bits)
  * per row and JIT-compiled. */
object Hilbert {
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val mask = (1L << bits) - 1L
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Native Hilbert index for layout clustering — the locality-better
  * sibling of [[graft.operators.Layout.zValue]]: every curve step is
  * distance 1 (no Z-curve jumps), so range pruning on the Hilbert
  * value bounds tighter (x, y) rectangles per row group. Registered as
  * SQL `graft_hilbert(x, y, bits)`; out-of-range coordinates are
  * masked into the 2^bits grid like zValue. Null → null. */
case class GraftHilbert(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"graft_hilbert: bits must be in [1, 31], got $bits")

  private def integral(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (integral(left.dataType) && integral(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hilbert requires integral inputs, got ${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override def nullSafeEval(x: Any, y: Any): Any =
    Hilbert.xy2d(bits, asLong(x), asLong(y))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.expr.Hilbert.xy2d($bits, (long) $x, (long) $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftHilbert =
    copy(left = newLeft, right = newRight)
}
