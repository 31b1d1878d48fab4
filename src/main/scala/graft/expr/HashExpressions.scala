package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** MinHash signature of a shingle array in ONE pass: for hash function i,
  * sig(i) = min over shingles s of xxhash64(i, s). Hash values are
  * bit-identical to Spark's `xxhash64(lit(i), s)` (seed chaining: the int i
  * is folded into the seed-42 state first, then the string) — so this
  * expression is a drop-in for the explode + `numHashes`×`min()` aggregate
  * plan, with NO shuffle at all: the signature is computed in the scan
  * stage. The per-hash seeds are precomputed once at plan time.
  *
  * Null shingle elements hash to the seed state alone (exactly what
  * `xxhash64(lit(i), NULL)` evaluates to — null children are skipped).
  * An empty array yields Long.MaxValue in every position (the fold
  * identity; the composed explode plan simply has no row to aggregate).
  *
  * Registered as SQL `graft_minhash_sig(shingles, numHashes)`. */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, "graft_minhash_sig: numHashes must be > 0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig requires array<string> input, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  /** seed state after hashing the int hash-index into xxhash64's seed 42 —
    * identical to Spark's multi-child seed chaining. */
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) {
        var i = 0
        while (i < numHashes) {
          if (seeds(i) < sig(i)) sig(i) = seeds(i)
          i += 1
        }
      } else {
        val s = arr.getUTF8String(j)
        var i = 0
        while (i < numHashes) {
          val h = XXH64.hashUTF8String(s, seeds(i))
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("mhSeeds", seeds, "long[]")
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val sig = ctx.freshName("sig")
      s"""
         |final int $n = $a.numElements();
         |final long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($a.isNullAt($j)) {
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      if ($seedsRef[$i] < $sig[$i]) $sig[$i] = $seedsRef[$i];
         |    }
         |  } else {
         |    final org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($j);
         |    for (int $i = 0; $i < $numHashes; $i++) {
         |      final long $h = $xxh.hashUTF8String($s, $seedsRef[$i]);
         |      if ($h < $sig[$i]) $sig[$i] = $h;
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array in ONE pass: each token's
  * `xxhash64(token)` casts a ±1 vote on every bit position; bit k of the
  * signature is set iff its vote sum is positive. Bit-identical to the
  * explode + 64×`sum()` aggregate plan (the test suite pins parity), with
  * NO shuffle: the signature is computed where the document is read.
  *
  * Null tokens hash to 42 (xxhash64's seed — null children are skipped),
  * mirroring the composed plan. An empty array yields 0L (all vote sums
  * zero, no bit strictly positive).
  *
  * Registered as SQL `graft_simhash(tokens)`. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires array<string> input, got ${dt.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h =
        if (arr.isNullAt(j)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
        k += 1
      }
      j += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (votes(k) > 0) sig |= 1L << k
      k += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val sig = ctx.freshName("sig")
      s"""
         |final int $n = $a.numElements();
         |final int[] $votes = new int[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  final long $h = $a.isNullAt($j)
         |    ? 42L
         |    : $xxh.hashUTF8String($a.getUTF8String($j), 42L);
         |  for (int $k = 0; $k < 64; $k++) {
         |    if ((($h >>> $k) & 1L) == 1L) $votes[$k]++; else $votes[$k]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $k = 0; $k < 64; $k++) {
         |  if ($votes[$k] > 0) $sig |= 1L << $k;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Exact Jaccard similarity of two SORTED distinct arrays via a
  * two-pointer merge: |A∩B| / (|A|+|B|−|A∩B|) in one pass, no per-row
  * hash-set allocation (Spark's `array_intersect` builds a hash set for
  * every invocation — the dominant cost when verifying millions of
  * candidate pairs against ~100-word documents). Inputs MUST be sorted
  * ascending with distinct elements (`sort_array(array_distinct(...))`,
  * done once per document and amortized over all its candidate pairs).
  * Two element types, both sides matching:
  *   - `array<string>`: UTF8String binary order, identical to
  *     `sort_array`'s;
  *   - `array<bigint>`: signed long order — the HASHED-set form the
  *     near-dup verify arms shuffle (xxhash64 of each element, 8 bytes
  *     per set member instead of the member text; Jaccard is a set
  *     measure, so the value is IDENTICAL under any injective mapping —
  *     a 64-bit collision inside one pair's union, probability
  *     ≲ m²·2⁻⁶⁵ for m-element sets, is the only deviation, the same
  *     accepted class as the xxhash64 span keys in SpanDedup).
  * Both arrays empty → 0.0. NULL input or element → NULL.
  *
  * Registered as SQL `graft_jaccard_sorted(a, b)`. */
case class JaccardSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "graft_jaccard_sorted requires array<string> or array<bigint> " +
          s"inputs on both sides, got ${l.sql}, ${r.sql}")
    }

  private def isLong: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jaccard_sorted"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    val long = isLong
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i) || b.isNullAt(j)) return null
      val c =
        if (long) java.lang.Long.compare(a.getLong(i), b.getLong(j))
        else a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = na.toDouble + nb - inter
    if (union == 0) 0.0 else inter / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val inter = ctx.freshName("inter")
      val c = ctx.freshName("c")
      val union = ctx.freshName("union")
      val cmp =
        if (isLong) s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
        else s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |int $i = 0, $j = 0, $inter = 0;
         |while ($i < $na && $j < $nb) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  final int $c = $cmp;
         |  if ($c == 0) { $inter++; $i++; $j++; }
         |  else if ($c < 0) $i++;
         |  else $j++;
         |}
         |if (!${ev.isNull}) {
         |  final double $union = (double) $na + $nb - $inter;
         |  ${ev.value} = ($union == 0) ? 0.0 : $inter / $union;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}

/** Fraction of positions where two equal-length long-array signatures
  * agree — the MinHash Jaccard estimator. One codegen'd loop versus an
  * interpreted `zip_with` + `filter` + `size` chain; evaluated once per
  * banded collision row in the LSH self-join, which made the composed
  * form the per-row hot spot. NULL on length mismatch or null element
  * (mirroring `zip_with` null propagation into the size-of-filter form
  * is not needed — the operator only ever feeds non-null signatures).
  *
  * Registered as SQL `graft_match_frac(a, b)`. */
case class SigMatchFraction(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_match_frac requires array<bigint> inputs, got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_match_frac"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0 || b.numElements() != n) return null
    var eq = 0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val eq = ctx.freshName("eq")
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0 || $b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $eq = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    if ($a.getLong($i) == $b.getLong($i)) $eq++;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = ((double) $eq) / $n;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigMatchFraction =
    copy(left = newLeft, right = newRight)
}

/** `graft_md5_u128(str)` → struct<h: bigint, l: bigint>: the md5 digest
  * as two big-endian 64-bit halves, each XOR'd with Long.MinValue so
  * SIGNED (h, l) struct ordering equals UNSIGNED 128-bit digest order —
  * which equals the lexicographic order of the lowercase hex string
  * `md5(str)`. An injective, order-preserving replacement for the
  * 32-hex md5 key in min/distinct/count pipelines (winnowing, t80):
  * 16 bytes per key instead of a ~40-byte string, long comparisons
  * instead of byte-wise string compares, identical selection and
  * identical counts by order-isomorphism. Recover the hex form with
  * `format_string("%016x%016x", h ^ MIN_LONG, l ^ MIN_LONG)`. */
case class Md5U128(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_md5_u128 requires a string argument, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("l", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_md5_u128"

  override protected def nullSafeEval(s: Any): Any =
    Md5U128.eval(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expr.Md5U128.eval($v);")

  override protected def withNewChildInternal(newChild: Expression): Md5U128 =
    copy(child = newChild)
}

object Md5U128 {
  def eval(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(s.getBytes)
    var hi = 0L; var lo = 0L
    var i = 0
    while (i < 8) { hi = (hi << 8) | (d(i) & 0xffL); i += 1 }
    while (i < 16) { lo = (lo << 8) | (d(i) & 0xffL); i += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](hi ^ Long.MinValue, lo ^ Long.MinValue))
  }
}
