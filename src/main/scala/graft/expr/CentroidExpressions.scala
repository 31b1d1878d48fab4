package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment kernel shared by eval and codegen.
  * Value-identical to the composed chain it replaces
  * (`array_position(sims, array_max(sims)) - 1` over k
  * `graft_cosine(vec, centroid_literal)` columns — pinned by the
  * t25/t28 goldens): per-centroid cosine uses the exact
  * [[CosineSimilarity]] accumulation order (dot/na/nb in index order,
  * `sqrt(na)*sqrt(nb)` denominator, zero-denominator → 0.0), and the
  * strict `>` comparison keeps the FIRST maximal centroid — the same
  * tie-break as `array_position`'s first-match contract. A null vector
  * element yields null (the composed chain's null-sim corner; no
  * corpus row exercises it). An all-NaN similarity row (NaN/Inf vector
  * components) assigns centroid 0 — matching the composed chain, where
  * `array_max` = NaN and `array_position`'s first NaN match is index 1;
  * without the clamp the strict `>` loop would leak -1, an id no probe
  * ever reads. */
object CentroidKernel {

  /** Flattened centroids: centroid `c`'s component `i` at `c*dims + i`. */
  def argmax(vec: ArrayData, isFloat: Boolean, cb: Array[Double],
             k: Int): java.lang.Integer = {
    val n = vec.numElements()
    if (k * n != cb.length) return null
    var best = -1
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        if (vec.isNullAt(i)) return null
        val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        val y = cb(c * n + i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val d = math.sqrt(na) * math.sqrt(nb)
      val sim = if (d == 0.0) 0.0 else dot / d
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    if (best < 0) 0 else best
  }

  /** Top-`n` centroid ids by (cosine desc, id asc) — [[argmax]] applied
    * `n` times with already-picked ids masked, so the per-pick
    * tie-break is identical to argmax's strict-`>` FIRST-max contract.
    * For NaN-free sims (every real corpus: cosine of finite vectors is
    * finite) the ranking equals `row_number() OVER (ORDER BY sim DESC,
    * cluster) <= n` over unrounded sims — the t25/t71 probe-ranking
    * SQL. NaN sims are the one divergence from that SQL shape and it
    * is deliberate: the strict-`>` loop ranks NaN sims LAST (a NaN
    * never wins a comparison), whereas Spark's `ORDER BY sim DESC`
    * sorts NaN greater than all doubles (NaN first) — matching argmax's
    * all-NaN→centroid-0 clamp, not the window; an all-NaN row
    * degenerates to ids in index order. Null element → null array. */
  def topn(vec: ArrayData, isFloat: Boolean, cb: Array[Double],
           k: Int, n: Int): Array[Int] = {
    val dims = vec.numElements()
    if (k * dims != cb.length) return null
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < dims) {
        if (vec.isNullAt(i)) return null
        val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        val y = cb(c * dims + i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val d = math.sqrt(na) * math.sqrt(nb)
      sims(c) = if (d == 0.0) 0.0 else dot / d
      c += 1
    }
    val take = math.min(n, k)
    val out = new Array[Int](take)
    val picked = new Array[Boolean](k)
    var p = 0
    while (p < take) {
      var best = -1
      var bestSim = Double.NegativeInfinity
      var j = 0
      while (j < k) {
        if (!picked(j) && sims(j) > bestSim) { bestSim = sims(j); best = j }
        j += 1
      }
      if (best < 0) { // all remaining NaN: lowest unpicked index
        var m = 0
        while (picked(m)) m += 1
        best = m
      }
      picked(best) = true
      out(p) = best
      p += 1
    }
    out
  }

  /** Analysis-time guard for the foldable centroids literal: both
    * expressions eagerly `toDoubleArray()` it for `addReferenceObj`, so
    * a foldable-but-NULL codebook (`CAST(NULL AS ARRAY<DOUBLE>)`) or an
    * array literal holding null elements — which sail through the
    * dataType match — would otherwise NPE at planning/codegen time. A
    * TypeCheckFailure here surfaces the malformed codebook where the
    * user can see it. */
  private[expr] def checkCentroidLiteral(name: String,
                                         right: Expression): TypeCheckResult = {
    val v = right.eval(null)
    if (v == null)
      return TypeCheckResult.TypeCheckFailure(
        s"$name: centroids literal evaluates to NULL")
    val a = v.asInstanceOf[ArrayData]
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i))
        return TypeCheckResult.TypeCheckFailure(
          s"$name: centroids literal holds a null element (index $i)")
      i += 1
    }
    TypeCheckResult.TypeCheckSuccess
  }
}

/** `graft_argmax_cosine(vec, centroids, k)` → int id of the
  * max-cosine centroid. `centroids` must be a foldable flattened
  * array<double> literal (k·dims values) — one codebook per query,
  * pinned into generated code via `addReferenceObj`, so assignment is
  * ONE static call per row instead of k inlined cosine loops plus an
  * array build (the k=16 composed form generated ~16×64-literal
  * methods per Lloyd's iteration — Janino compile time dominated
  * training on small corpora). */
case class CentroidArgmax(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (l, ArrayType(DoubleType, _)) if elemOk(l) && right.foldable =>
        if (k < 1)
          TypeCheckResult.TypeCheckFailure("graft_argmax_cosine: k must be >= 1")
        else CentroidKernel.checkCentroidLiteral("graft_argmax_cosine", right)
      case (l, r) if elemOk(l) => TypeCheckResult.TypeCheckFailure(
        s"graft_argmax_cosine: centroids must be a foldable array<double>, got ${r.sql}")
      case (l, _) => TypeCheckResult.TypeCheckFailure(
        s"graft_argmax_cosine requires array<float|double> vec, got ${l.sql}")
    }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_argmax_cosine"

  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val centroids: Array[Double] =
    right.eval(null).asInstanceOf[ArrayData].toDoubleArray()

  override protected def nullSafeEval(vec: Any, _cb: Any): Any = {
    val r = CentroidKernel.argmax(vec.asInstanceOf[ArrayData], isFloat, centroids, k)
    if (r == null) null else r.intValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCentroids", centroids, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Integer $r =
         |  graft.expr.CentroidKernel.argmax($v, $isFloat, $ref, $k);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.intValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CentroidArgmax =
    copy(left = newLeft, right = newRight)
}

/** `graft_topn_cosine(vec, centroids, k, n)` → array<int> of the `n`
  * nearest centroid ids by (cosine desc, id asc) — the per-row IVF
  * PROBE ranking as one scan-stage static call. This is what makes a
  * batch kNN JOIN shuffle-free on the query side: the alternative
  * (crossJoin against the centroid table + a row_number window per
  * query) shuffles |Q|·k thin rows per probe ranking, which at
  * autoK-scale cluster counts is a full extra exchange of the query
  * corpus. Same foldable-centroid-literal contract as
  * [[CentroidArgmax]]; ranking semantics pinned to the t25 oracle's
  * `row_number() OVER (ORDER BY sim DESC, cluster)` by the masked
  * re-argmax construction in [[CentroidKernel.topn]]. */
case class CentroidTopN(left: Expression, right: Expression, k: Int, n: Int)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (l, ArrayType(DoubleType, _)) if elemOk(l) && right.foldable =>
        if (k < 1 || n < 1)
          TypeCheckResult.TypeCheckFailure("graft_topn_cosine: k and n must be >= 1")
        else CentroidKernel.checkCentroidLiteral("graft_topn_cosine", right)
      case (l, r) if elemOk(l) => TypeCheckResult.TypeCheckFailure(
        s"graft_topn_cosine: centroids must be a foldable array<double>, got ${r.sql}")
      case (l, _) => TypeCheckResult.TypeCheckFailure(
        s"graft_topn_cosine requires array<float|double> vec, got ${l.sql}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_topn_cosine"

  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val centroids: Array[Double] =
    right.eval(null).asInstanceOf[ArrayData].toDoubleArray()

  override protected def nullSafeEval(vec: Any, _cb: Any): Any = {
    val r = CentroidKernel.topn(vec.asInstanceOf[ArrayData], isFloat, centroids, k, n)
    if (r == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCentroids", centroids, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val r = ctx.freshName("r")
      s"""
         |int[] $r = graft.expr.CentroidKernel.topn($v, $isFloat, $ref, $k, $n);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($r); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CentroidTopN =
    copy(left = newLeft, right = newRight)
}
