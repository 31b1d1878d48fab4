package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic BPE merge-table training (Sennrich et al. 2016) over a
  * document corpus — the learning half of [[graft.expr.BpeCount]].
  *
  * Scale shape: the ONLY distributed stage is the (word, count)
  * aggregation — one map-side-combined shuffle over the corpus. The
  * merge loop then runs driver-side over a FREQUENCY-CAPPED vocabulary
  * (`maxVocab` rows through [[graft.core.Bounded]], the explicit
  * control-plane contract) — the standard practice for BPE trainers:
  * pair statistics over the top-V words converge to the corpus
  * statistics because pair counts are frequency-weighted, and the tail
  * it ignores is exactly the noise a tokenizer shouldn't learn from.
  * Nothing here iterates Spark actions per merge (a naive distributed
  * formulation would run `numMerges` shuffles).
  *
  * Determinism (required for the committed t52 artifact and its
  * GoldenSpec parity gate): vocabulary = top `maxVocab` by
  * (count DESC, word ASC); each round merges the pair with the highest
  * frequency-weighted adjacent-position count, ties broken by
  * lexicographic (left, right); training stops early when the best
  * pair's count drops below 2 (a merge seen once generalizes nothing).
  * Merge application is the same leftmost/non-overlapping scan the
  * inference kernel performs. */
object BpeTrain {

  /** Learn up to `numMerges` merges. Returns "left right" strings in
    * rank order — the literal [[graft.expr.BpeCount]] expects. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxVocab: Int = 65536): Seq[String] = {
    require(numMerges >= 0 && maxVocab >= 1)
    val vocabRows = graft.core.Bounded.collect(
      docs.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w"))
        .limit(maxVocab),
      maxVocab, "BpeTrain.vocab")

    // word → (symbols, weight); symbols as code-point strings
    var vocab: Array[(Array[String], Long)] = vocabRows.map { r =>
      val w = r.getString(0)
      val syms = scala.collection.mutable.ArrayBuffer.empty[String]
      var ci = 0
      while (ci < w.length) {
        val cp = w.codePointAt(ci)
        val n = Character.charCount(cp)
        syms += w.substring(ci, ci + n)
        ci += n
      }
      (syms.toArray, r.getLong(1))
    }

    val merges = scala.collection.mutable.ArrayBuffer.empty[String]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, cnt) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + cnt)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val ((l, r), best) = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }
        if (best < 2) exhausted = true
        else {
          merges += s"$l $r"
          val fused = l + r
          vocab = vocab.map { case (syms, cnt) =>
            // leftmost/non-overlapping scan — same as inference fusing
            // this pair repeatedly at its leftmost occurrence
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                out += fused; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, cnt)
          }
        }
      }
      round += 1
    }
    merges.toSeq
  }
}
