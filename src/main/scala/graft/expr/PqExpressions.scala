package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou, Douze & Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search", public literature): encode
  * a vector as `m` sub-space codeword ids, and score codes against a
  * precomputed asymmetric-distance (ADC) lookup table. Both run per
  * corpus row, so they are native codegen'd expressions (static helper
  * invoked from `doGenCode`, the [[ShingleSet]] pattern) — the composed
  * HOF equivalent evaluates interpreted per element.
  *
  * The codebook / ADC table ride the plan as FOLDABLE array<double>
  * literals pinned via `addReferenceObj` (the [[BloomContainsLong]]
  * pattern): k·m·sub ≈ thousands of doubles, broadcast-sized by
  * construction, never shuffled per row. */
object PqKernel {

  /** Flattened codebook layout: codeword d-th component of code `c` in
    * subspace `j` lives at `((j * k) + c) * sub + d`. A vector whose
    * length is not m·sub, or with a null element, returns null (the
    * [[CentroidKernel]] convention) — an unchecked `getFloat` past an
    * UnsafeArrayData's end is a garbage read, not an error. */
  def encode(vec: ArrayData, isFloat: Boolean, codebook: Array[Double],
             m: Int, k: Int, sub: Int): ArrayData = {
    if (vec.numElements() != m * sub) return null
    val codes = new Array[Any](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val base = (j * k + c) * sub
        var d = 0.0
        var i = 0
        while (i < sub) {
          if (vec.isNullAt(j * sub + i)) return null
          val v = if (isFloat) vec.getFloat(j * sub + i).toDouble
                  else vec.getDouble(j * sub + i)
          val diff = v - codebook(base + i)
          d += diff * diff
          i += 1
        }
        // strict < keeps the FIRST minimal codeword — deterministic ties
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  /** ADC score: Σ_j table[j·k + codes(j)] — the approximate squared L2
    * distance to the query whose per-codeword partials fill `table`.
    * Codes that don't fit the table (wrong m, code outside [0, k), null
    * element) return null instead of indexing out of bounds. */
  def adc(codes: ArrayData, table: Array[Double], k: Int): java.lang.Double = {
    val m = codes.numElements()
    if (m * k != table.length) return null
    var s = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codes.getInt(j)
      if (c < 0 || c >= k) return null
      s += table(j * k + c)
      j += 1
    }
    s
  }
}

/** `graft_pq_encode(vec, codebook, m, k)` → array<int> of m codeword
  * ids. `codebook` must be a foldable array<double> literal (one
  * codebook per QUERY, not per row). */
case class PqEncode(left: Expression, right: Expression, m: Int, k: Int)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (l, ArrayType(DoubleType, _)) if elemOk(l) && right.foldable =>
        if (m >= 1 && k >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure("graft_pq_encode: m, k must be >= 1")
      case (l, r) if elemOk(l) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_pq_encode: codebook must be a foldable array<double>, got ${r.sql}")
      case (l, _) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_encode requires array<float|double> vec, got ${l.sql}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val codebook: Array[Double] =
    right.eval(null).asInstanceOf[ArrayData].toDoubleArray()

  @transient private lazy val sub: Int = codebook.length / (m * k)

  override protected def nullSafeEval(vec: Any, _cb: Any): Any =
    PqKernel.encode(vec.asInstanceOf[ArrayData], isFloat, codebook, m, k, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPqCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val r = ctx.freshName("r")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.expr.PqKernel.encode($v, $isFloat, $ref, $m, $k, $sub);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

/** `graft_pq_adc(codes, table, k)` → double: approximate squared L2 via
  * the per-query ADC lookup table (foldable array<double> of m·k
  * partial distances). */
case class PqAdc(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _))
        if right.foldable => TypeCheckResult.TypeCheckSuccess
      case (ArrayType(IntegerType, _), r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_pq_adc: table must be a foldable array<double>, got ${r.sql}")
      case (l, _) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_adc requires array<int> codes, got ${l.sql}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adc"

  @transient private lazy val table: Array[Double] =
    right.eval(null).asInstanceOf[ArrayData].toDoubleArray()

  override protected def nullSafeEval(codes: Any, _t: Any): Any = {
    val r = PqKernel.adc(codes.asInstanceOf[ArrayData], table, k)
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPqTable", table, "double[]")
    nullSafeCodeGen(ctx, ev, (c, _) => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Double $r = graft.expr.PqKernel.adc($c, $ref, $k);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
