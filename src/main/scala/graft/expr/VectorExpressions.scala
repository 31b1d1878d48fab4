package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Deterministic ±1 Rademacher hyperplane components for (table, bit, dim)
  * — the single source of truth shared by the composed-Column LSH path
  * ([[graft.operators.Similarity.lshBucket]]) and the native
  * [[LshBuckets]] expression, so both produce identical buckets. */
object Hyperplanes {
  def sign(table: Int, bit: Int, dim: Int): Double = {
    val h = scala.util.hashing.MurmurHash3.caseClassHash((table, bit, dim))
    if ((h & 1) == 0) 1.0 else -1.0
  }

  /** Flat sign matrix for `tables` LSH tables of `bits` hyperplanes over
    * `dims` dimensions; index = ((table*bits)+bit)*dims + dim. */
  def matrix(dims: Int, bits: Int, tables: Int): Array[Double] = {
    val m = new Array[Double](tables * bits * dims)
    var t = 0
    while (t < tables) {
      var b = 0
      while (b < bits) {
        var i = 0
        while (i < dims) {
          m(((t * bits) + b) * dims + i) = sign(t, b, i)
          i += 1
        }
        b += 1
      }
      t += 1
    }
    m
  }
}

/** Fused cosine similarity over two embedding columns
  * (`array<float>`/`array<double>`): ONE pass computes the dot product and
  * both norms — versus three interpreted higher-order `aggregate` folds for
  * the composed-Column form (lambda expressions never enter whole-stage
  * codegen). Accumulation is sequential in index order in double, so values
  * are bit-identical to the composed implementation (the test suite pins
  * this). Null / length-mismatch semantics also mirror the composed
  * `zip_with`+`aggregate` form: any null element or differing lengths
  * → NULL; zero norm → 0.0.
  *
  * Registered as SQL `graft_cosine` by [[GraftExtensions]]. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine requires array<float|double> inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  @inline private def get(a: ArrayData, dt: DataType, i: Int): Double =
    dt match {
      case ArrayType(FloatType, _) => a.getFloat(i).toDouble
      case _ => a.getDouble(i)
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = get(a, left.dataType, i)
      val y = get(b, right.dataType, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val getA = left.dataType match {
        case ArrayType(FloatType, _) => s"(double) $a.getFloat($i)"
        case _ => s"$a.getDouble($i)"
      }
      val getB = right.dataType match {
        case ArrayType(FloatType, _) => s"(double) $b.getFloat($i)"
        case _ => s"$b.getDouble($i)"
      }
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = $getA;
         |    final double $y = $getB;
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    final double $d = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |    ${ev.value} = ($d == 0.0) ? 0.0 : $dot / $d;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** All `tables` random-hyperplane LSH buckets of an embedding vector in ONE
  * pass: for each of `tables × bits` hyperplanes, the ±1-sign projection is
  * accumulated while streaming the vector once; bit b of table t is set iff
  * its projection is > 0. Returns `array<long>` of length `tables`.
  *
  * The composed-Column form evaluates `tables × bits` separate interpreted
  * `aggregate`+`zip_with` folds — ~40 traversals of every vector per row.
  * This expression is a single codegen'd loop with a baked sign matrix
  * (identical signs via [[Hyperplanes]], so buckets match exactly; the test
  * suite pins parity).
  *
  * Mirrors composed null semantics: any null element or a vector whose
  * length ≠ `dims` yields all-zero projections (every bucket 0L), because
  * `zip_with` null-pads and `aggregate` nulls the fold, and `when(null > 0)`
  * takes the 0-bit branch.
  *
  * Registered as SQL `graft_lsh_buckets(vec, dims, bits, tables)`. */
case class LshBuckets(child: Expression, dims: Int, bits: Int, tables: Int)
    extends UnaryExpression {

  require(dims > 0 && bits > 0 && bits <= 63 && tables > 0,
    "graft_lsh_buckets: need dims > 0, 0 < bits <= 63, tables > 0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_buckets requires array<float|double> input, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  @transient private lazy val signs: Array[Double] =
    Hyperplanes.matrix(dims, bits, tables)

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val nPlanes = tables * bits
    val out = new Array[Long](tables)
    if (v.numElements() == dims) {
      var degenerate = false
      var i = 0
      while (i < dims && !degenerate) {
        if (v.isNullAt(i)) degenerate = true
        i += 1
      }
      if (!degenerate) {
        val acc = new Array[Double](nPlanes)
        i = 0
        while (i < dims) {
          val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
          var p = 0
          while (p < nPlanes) {
            acc(p) += x * signs(p * dims + i)
            p += 1
          }
          i += 1
        }
        var p = 0
        while (p < nPlanes) {
          if (acc(p) > 0) out(p / bits) |= 1L << (p % bits)
          p += 1
        }
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("lshSigns", signs, "double[]")
    val nPlanes = tables * bits
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val x = ctx.freshName("x")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      val bad = ctx.freshName("bad")
      val getV =
        if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |final long[] $out = new long[$tables];
         |if ($v.numElements() == $dims) {
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $dims && !$bad; $i++) {
         |    if ($v.isNullAt($i)) $bad = true;
         |  }
         |  if (!$bad) {
         |    final double[] $acc = new double[$nPlanes];
         |    for (int $i = 0; $i < $dims; $i++) {
         |      final double $x = $getV;
         |      for (int $p = 0; $p < $nPlanes; $p++) {
         |        $acc[$p] += $x * $signsRef[$p * $dims + $i];
         |      }
         |    }
         |    for (int $p = 0; $p < $nPlanes; $p++) {
         |      if ($acc[$p] > 0) $out[$p / $bits] |= 1L << ($p % $bits);
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}
