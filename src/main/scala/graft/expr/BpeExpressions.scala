package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding subword counter (Sennrich, Haddow & Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units" —
  * public literature): count how many BPE tokens a text segments into
  * under a LEARNED merges table ([[graft.operators.BpeTrain]]). This is
  * the token-accurate upgrade over [[graft.functions.TextFunctions
  * .subwordCount]]'s character-class regex estimate — a training-data
  * pipeline budgets in TOKENIZER tokens, and fertility (tokens per
  * word) is only meaningful against the tokenizer actually in use.
  *
  * Segmentation algorithm (deterministic, and mirrored verbatim by the
  * t52 DuckDB oracle's recursive CTE):
  *   - words = `\s+` split of the trimmed text (exactly
  *     [[graft.functions.TextFunctions.tokens]]); empty text → 0;
  *   - a word starts as its code-point character sequence;
  *   - repeat: among adjacent symbol pairs present in the merges table,
  *     find the LOWEST-RANK (earliest-learned) pair and fuse its
  *     LEFTMOST occurrence; stop when no adjacent pair is in the table;
  *   - the word's token count is the surviving symbol count; the text's
  *     count is the sum over words.
  *
  * The merges table rides the plan as a foldable array<string> literal
  * ("left right" per element, rank = position) pinned via
  * `addReferenceObj` as a prebuilt rank map — vocabulary-sized by
  * construction, never shuffled. The expression itself is scan-stage,
  * zero-shuffle, codegen'd: exactly where per-row tokenization must
  * live at 100 TB. */
object BpeKernel {

  /** Rank lookup built once per plan from the "left right" merge list. */
  def buildRanks(merges: Array[String]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      // first writer wins: a duplicate pair keeps its best (lowest) rank
      if (!m.containsKey(merges(i))) m.put(merges(i), i)
      i += 1
    }
    m
  }

  /** BPE token count of one word (no whitespace inside). */
  def wordCount(word: String, ranks: java.util.HashMap[String, Integer]): Int = {
    if (word.isEmpty) return 0
    // code-point symbols, so astral characters stay single symbols
    val syms = new java.util.ArrayList[String](word.length)
    var ci = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      val n = Character.charCount(cp)
      syms.add(word.substring(ci, ci + n))
      ci += n
    }
    var done = false
    while (!done && syms.size > 1) {
      var best = Integer.MAX_VALUE
      var bestIdx = -1
      var i = 0
      while (i < syms.size - 1) {
        val r = ranks.get(syms.get(i) + " " + syms.get(i + 1))
        // strict < keeps the LEFTMOST occurrence of the best-rank pair
        if (r != null && r < best) { best = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        syms.set(bestIdx, syms.get(bestIdx) + syms.get(bestIdx + 1))
        syms.remove(bestIdx + 1)
      }
    }
    syms.size
  }

  /** Total BPE token count over all whitespace-separated words. */
  def count(text: UTF8String, ranks: java.util.HashMap[String, Integer]): Long = {
    val s = text.toString.trim
    if (s.isEmpty) return 0L
    var total = 0L
    for (w <- s.split("\\s+")) total += wordCount(w, ranks)
    total
  }
}

/** `graft_bpe_count(text, merges)` → bigint BPE token count. `merges`
  * must be a foldable array<string> literal of "left right" pairs in
  * rank order (one learned table per QUERY, not per row). */
case class BpeCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_bpe_count: merges must be a literal (one learned table per query)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_count requires (string, array<string>), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    BpeKernel.buildRanks(
      (0 until arr.numElements()).map(arr.getUTF8String(_).toString).toArray)
  }

  override protected def nullSafeEval(text: Any, _m: Any): Any =
    BpeKernel.count(text.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBpeRanks", ranks,
      "java.util.HashMap<String, Integer>")
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.expr.BpeKernel.count($t, $ref);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeCount =
    copy(left = newLeft, right = newRight)
}
