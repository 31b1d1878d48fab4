package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass tokenize → shingle → distinct kernel shared by the native
  * expression and its parity spec. Semantics are BIT-IDENTICAL to the
  * composed Column chain it replaces
  * (`array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(split(trim(text), "\\s+"), i+1, n))))` with the short-document
  * whole-text fallback):
  *   - trim = `UTF8String.trim` (ASCII space only — NOT Java's
  *     `String.trim`, which also strips control chars);
  *   - tokenization = `java.util.regex` split on `\s+` with limit −1,
  *     the exact engine Spark's `split` uses;
  *   - `< n` tokens → one whole-text shingle (`concat_ws` join);
  *   - distinct preserves first-occurrence order (`array_distinct`'s
  *     contract, so shingle arrays compare equal element-for-element).
  */
object ShingleSet {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = ws.split(text.trim().toString, -1)
    if (toks.length < n) {
      new GenericArrayData(Array[Any](
        UTF8String.fromString(String.join(" ", toks: _*))))
    } else {
      val seen = new java.util.LinkedHashSet[String]((toks.length - n + 2) * 2)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks(i + k))
          k += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(out)
    }
  }
}

/** Luhn checksum kernel (ISO/IEC 7812): from the right, double every
  * second digit, subtract 9 from two-digit doubles, total % 10 == 0.
  * Defined over ASCII-digit strings (the `\b\d{13,19}\b` candidates —
  * [[graft.operators.PiiRedact]] never feeds it anything else). */
object Luhn {
  def valid(s: UTF8String): Boolean = {
    val bytes = s.getBytes
    var total = 0
    var i = bytes.length - 1
    var double = false
    while (i >= 0) {
      var d = bytes(i) - '0'
      if (double) { d *= 2; if (d > 9) d -= 9 }
      total += d
      double = !double
      i -= 1
    }
    total % 10 == 0
  }
}

/** Native Luhn validity — replaces the interpreted
  * `aggregate(sequence(...))` fold
  * ([[graft.operators.PiiRedact.luhnValidComposed]], kept for the
  * parity spec). The fold only ran on regex-matched candidates, but a
  * digit-heavy corpus (code, logs, id dumps) makes candidates the
  * common case, and each fold evaluation walked an expression tree per
  * digit; this is one JIT'd call per candidate, safe for the streaming
  * curation path. Null → null. Registered as SQL `graft_luhn(digits)`. */
case class GraftLuhn(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_luhn requires string input, got ${dt.sql}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_luhn"

  override def nullSafeEval(input: Any): Any =
    Luhn.valid(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.Luhn.valid($a);")

  override protected def withNewChildInternal(newChild: Expression): GraftLuhn =
    copy(child = newChild)
}

/** Unicode NFC (UAX #15 canonical composition) kernel. The
  * already-composed fast path dominates real corpora: `isNormalized`
  * is a scan with no allocation, and only pages that actually carry
  * decomposed sequences pay the normalize + re-encode. */
object Nfc {
  import java.text.Normalizer
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Native Unicode NFC normalization — Spark has no built-in Unicode
  * normalizer, and text cleaning must canonically compose decomposed
  * sequences (`e` + U+0301 → `é`) before any hash/dedup/tokenize pass
  * or visually identical documents stop comparing equal. One JIT'd
  * call per row with a zero-allocation already-normalized fast path.
  * Value-parity with DuckDB's `nfc_normalize` (both implement UAX #15)
  * is what makes t59 fully SQL-oracled. Null → null. Registered as SQL
  * `graft_nfc(text)`. */
case class GraftNfc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires string input, got ${dt.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    Nfc.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.Nfc.normalize($a);")

  override protected def withNewChildInternal(newChild: Expression): GraftNfc =
    copy(child = newChild)
}

/** Distinct word n-gram (shingle) array of a document in ONE pass —
  * the blocking unit of every text near-dup detector (t07/t09/t15/t23/
  * t24/t26/t31). The composed Column form evaluates its `transform`
  * lambda INTERPRETED once per shingle position (expression-tree walk +
  * slice copy + concat per n-gram, measured ~4 s per corpus pass at
  * sf0.1); this expression runs the [[ShingleSet]] kernel as one JIT'd
  * call per document. Null text → null. Registered as SQL
  * `graft_shingles(text, n)`. */
case class GraftShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "graft_shingles: n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires string input, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleSet.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.ShingleSet.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): GraftShingles =
    copy(child = newChild)
}

/** Single-pass character/token kernels for the quality-signal hot path
  * (symbol ratio, stopword ratio — computed for EVERY document by every
  * quality gate: t02/t16/t22/t33/t43/t45, CurationPipeline). The
  * composed forms were measured at 100× scale costing 420 cpu-s
  * (symbolRatio: `regexp_replace(lower(text), "[^a-z0-9 ]", "")`
  * builds a replacement string per row through java.util.regex) and
  * 118 cpu-s (stopwordRatio: the `split` evaluated THREE times — in
  * the filter, and in both `size` calls — plus an interpreted lambda
  * per token) on a 500 k-doc corpus. These kernels are value-identical
  * byte scans / single splits. */
object QualityKernel {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Code points of `s` inside `[a-z0-9 ]` — exactly
    * `length(regexp_replace(s, "[^a-z0-9 ]", ""))` without building
    * the replacement string: the class is pure ASCII, so a multi-byte
    * UTF-8 code point can never match and is skipped whole (length()
    * counts code points, so skipping keeps the arithmetic aligned). */
  def cleanLen(s: UTF8String): Long = {
    val bytes = s.getBytes
    var i = 0
    var keep = 0L
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      if (b < 0x80) {
        if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || b == ' ')
          keep += 1
        i += 1
      } else i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    keep
  }

  /** Fraction of whitespace tokens of `s` that appear in `stops` —
    * exactly `size(filter(split(trim(s), "\\s+"), t => t IN stops)) /
    * size(split(trim(s), "\\s+"))` with the zero-token guard: same
    * ASCII-space trim (`UTF8String.trim`), same java.util.regex split
    * with limit −1 (the [[ShingleSet]] parity contract), ONE split
    * evaluation, hash-set membership. */
  def stopRatio(s: UTF8String, stops: java.util.HashSet[String]): Double = {
    val parts = ws.split(s.trim().toString, -1)
    if (parts.length == 0) return 0.0
    var hits = 0
    var i = 0
    while (i < parts.length) {
      if (stops.contains(parts(i))) hits += 1
      i += 1
    }
    hits.toDouble / parts.length
  }
}

/** `graft_clean_len(str)` → count of `str`'s code points inside
  * `[a-z0-9 ]`. Callers keep the composed shape around it (lower()
  * upstream, the total/clean arithmetic downstream) so the value path
  * is unchanged — only the per-row regex replacement is gone. */
case class GraftCleanLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_clean_len requires string input, got ${dt.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_clean_len"

  override def nullSafeEval(input: Any): Any =
    QualityKernel.cleanLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.QualityKernel.cleanLen($a);")

  override protected def withNewChildInternal(newChild: Expression): GraftCleanLen =
    copy(child = newChild)
}

/** `graft_stop_ratio(str, stopwords)` → stopword-token fraction of
  * `str` (pass the lowercased text; the 10-word public list rides as a
  * foldable array<string> literal, same contract as the centroid
  * kernels). */
case class GraftStopRatio(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        if (right.eval(null) == null)
          TypeCheckResult.TypeCheckFailure(
            "graft_stop_ratio: stopwords literal evaluates to NULL")
        else TypeCheckResult.TypeCheckSuccess
      case (StringType, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_stop_ratio: stopwords must be a foldable array<string>, got ${r.sql}")
      case (l, _) => TypeCheckResult.TypeCheckFailure(
        s"graft_stop_ratio requires string input, got ${l.sql}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_stop_ratio"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val a = right.eval(null).asInstanceOf[ArrayData]
    val s = new java.util.HashSet[String](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) s.add(a.getUTF8String(i).toString)
      i += 1
    }
    s
  }

  override protected def nullSafeEval(str: Any, _w: Any): Any =
    QualityKernel.stopRatio(str.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftStopSet", stopSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, (s, _) =>
      s"${ev.value} = graft.expr.QualityKernel.stopRatio($s, $ref);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftStopRatio =
    copy(left = newLeft, right = newRight)
}

/** One-pass n-gram repetition kernel shared by [[GraftRepRatio]] and
  * its parity spec: the fraction of a document's raw n-grams claimed by
  * its single most repeated n-gram (Gopher-style repetition signal).
  * Value-identical to the relational form it replaces —
  * `explode(ngramsRaw(text, n)) → groupBy(doc_id, gram).count() →
  * groupBy(doc_id).agg(max(c) / sum(c))` — but computed per document
  * at the SCAN, so the (doc_id, gram-text) rows never exist and
  * nothing shuffles: the relational plan's exchange carries one row
  * per n-gram OCCURRENCE (~100 M rows of text keys at the 100× probe
  * corpus, measured 2 628 cpu-s / 93 s wall for t17), while this
  * kernel is one JIT'd call per document over the same tokenization
  * contract as [[ShingleSet]] (UTF8String.trim, java regex `\s+`
  * split, limit −1).
  *
  * `< n` tokens → 0.0 (the relational form's left-join/coalesce path
  * for documents that produce no n-grams). */
object RepRatio {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String, n: Int): Double = {
    val toks = ws.split(text.trim().toString, -1)
    val total = toks.length - n + 1
    if (total <= 0) return 0.0
    val counts = new java.util.HashMap[String, Int](total * 2)
    val sb = new java.lang.StringBuilder
    var max = 0
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      val c = counts.merge(sb.toString, 1, Integer.sum)
      if (c > max) max = c
      i += 1
    }
    max.toDouble / total
  }
}

/** `graft_rep_ratio(text, n)` → max n-gram count / total n-grams of
  * `text` (0.0 below n tokens; null text → null). The t17 repetition
  * signal as a scan-stage kernel — see [[RepRatio]] for the shuffle it
  * deletes. Callers keep rounding (`round(..., 4)`) in the query so
  * the value path matches the SQL oracle's `round(max(c) / sum(c), 4)`
  * bit for bit. */
case class GraftRepRatio(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "graft_rep_ratio: n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_rep_ratio requires string input, got ${dt.sql}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_rep_ratio"

  override def nullSafeEval(input: Any): Any =
    RepRatio.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.RepRatio.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): GraftRepRatio =
    copy(child = newChild)
}

/** One-pass duplicate-n-gram mass kernel shared by [[GraftDupMass]] and
  * its parity spec: the fraction of a document's raw n-gram OCCURRENCES
  * that belong to an n-gram repeated (count ≥ 2) within the document —
  * the Gopher "fraction of text in duplicate n-grams" family, the
  * second repetition signal next to [[RepRatio]]'s max-gram share.
  * Value-identical to the relational form it replaces —
  * `explode(ngramsRaw(text, n)) → groupBy(doc_id, gram).count() →
  * groupBy(doc_id).agg(sum(c where c ≥ 2) / sum(c))` — but computed per
  * document at the SCAN, so the (doc_id, gram-text) occurrence rows
  * never exist and nothing shuffles (the relational plan's exchange
  * carries one ~5-token string key per n-gram occurrence — ~5× the
  * corpus bytes for the t32 5-gram signal). Same tokenization contract
  * as [[ShingleSet]]/[[RepRatio]]: `UTF8String.trim`, java regex `\s+`
  * split with limit −1. Duplicate mass accumulates one-pass: a gram's
  * count reaching 2 contributes both occurrences, each later hit one
  * more.
  *
  * `< n` tokens → 0.0 (the relational form's left-join/coalesce path
  * for documents that produce no n-grams). */
object DupMass {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String, n: Int): Double = {
    val toks = ws.split(text.trim().toString, -1)
    val total = toks.length - n + 1
    if (total <= 0) return 0.0
    val counts = new java.util.HashMap[String, Int](total * 2)
    val sb = new java.lang.StringBuilder
    var dup = 0
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      val c = counts.merge(sb.toString, 1, Integer.sum)
      if (c == 2) dup += 2 else if (c > 2) dup += 1
      i += 1
    }
    dup.toDouble / total
  }
}

/** `graft_dup_mass(text, n)` → fraction of n-gram occurrences in
  * within-doc duplicated n-grams (0.0 below n tokens; null text →
  * null). See [[DupMass]] for the shuffle it deletes. Callers keep
  * rounding (`round(..., 4)`) in the query so the value path matches
  * the SQL oracle's `round(sum(...) / sum(c), 4)` bit for bit. */
case class GraftDupMass(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "graft_dup_mass: n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_dup_mass requires string input, got ${dt.sql}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dup_mass"

  override def nullSafeEval(input: Any): Any =
    DupMass.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.DupMass.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): GraftDupMass =
    copy(child = newChild)
}

/** One-pass per-document token-distribution profile shared by
  * [[GraftTokenProfile]] and its parity spec: Shannon entropy of the
  * lowercased token distribution plus the type and token counts — the
  * t39 vocabulary-richness signals. Value-identical to the relational
  * form it replaces — `explode(tokens(lower(text))) →
  * groupBy(doc_id, t).count() → window sum → groupBy(doc_id)` (three
  * exchanges of token-text keys) — but computed per document at the
  * SCAN. Arithmetic matches the query plan it replaces term for term:
  * p = c / n in double, log2 p = Math.log(p) / Math.log(2.0) (Spark's
  * `log(2.0, p)`), entropy = −Σ p·log2 p with rounding left to the
  * caller (`round(..., 4) + 0.0`, the oracle's −0.0 normalizer). Per-
  * term double summation order differs from the hash-aggregate's group
  * order exactly as the aggregate's own order differs from DuckDB's —
  * absorbed by the 4 dp rounding on both sides. Lowercasing uses
  * `UTF8String.toLowerCase`, the same kernel Spark's `lower` plans.
  *
  * Whitespace-only / empty text → (0.0, 0, 0): the relational form
  * filters `length(trim(text)) > 0` and left-join/coalesces the
  * missing rows to exactly these values. */
object TokenProfile {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val trimmed = text.toLowerCase.trim()
    if (trimmed.numBytes() == 0) {
      return org.apache.spark.sql.catalyst.InternalRow(0.0, 0L, 0L)
    }
    val toks = ws.split(trimmed.toString, -1)
    val n = toks.length
    val counts = new java.util.HashMap[String, Int](n * 2)
    var i = 0
    while (i < n) {
      counts.merge(toks(i), 1, Integer.sum)
      i += 1
    }
    var sum = 0.0
    val it = counts.values().iterator()
    val ln2 = Math.log(2.0)
    while (it.hasNext) {
      val p = it.next().toDouble / n
      sum += p * (Math.log(p) / ln2)
    }
    org.apache.spark.sql.catalyst.InternalRow(-sum, counts.size().toLong, n.toLong)
  }
}

/** `graft_token_profile(text)` → struct(entropy double, n_types bigint,
  * n_tokens bigint) of the lowercased whitespace-token distribution
  * (null text → null struct). See [[TokenProfile]] for the shuffles it
  * deletes; callers keep the oracle's `round(entropy, 4) + 0.0`. */
case class GraftTokenProfile(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_token_profile requires string input, got ${dt.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("entropy", DoubleType, nullable = false),
    StructField("n_types", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false)))
  override def prettyName: String = "graft_token_profile"

  override def nullSafeEval(input: Any): Any =
    TokenProfile.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expr.TokenProfile.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): GraftTokenProfile =
    copy(child = newChild)
}
