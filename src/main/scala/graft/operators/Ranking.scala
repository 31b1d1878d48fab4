package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** BM25 keyword retrieval over a document corpus — the lexical-search
  * side of a training-data pipeline (mining documents that match a topic
  * probe, building seed sets for classifier-based filtering, retrieval
  * baselines next to the embedding ANN path in [[Similarity]]).
  *
  * Okapi BM25 (Robertson & Spärck Jones; the standard probabilistic
  * ranking function, public literature):
  *
  *   score(d, q) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1)
  *                              / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
  *   idf(t)     = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
  *
  * Spark-first plan, one corpus token pass: the exploded token stream
  * feeds BOTH per-doc length (groupBy doc) and per-(doc, query-term)
  * term frequency (filter to the query vocabulary FIRST — the tf table
  * shuffles only |docs|·|q| skinny rows, never the full posting list).
  * df and (N, avgdl) are tiny aggregates broadcast to the scorer, so the
  * only wide shuffle is the doc-keyed tf/length aggregation. No inverted
  * index materialization is needed for one-shot scoring; persist the tf
  * table keyed by term if many queries will be served.
  *
  * Determinism contract: the returned score is rounded to 4 dp and the
  * rank is computed over the ROUNDED score (ties broken by id), so
  * floating-sum order cannot reorder results across engines. */
object Ranking {

  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           topK: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "bm25: at least one query term")
    require(topK > 0, "bm25: topK must be positive")
    val terms = queryTerms.map(_.toLowerCase).distinct

    val base = docs.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val tok = base.select(col("doc_id"),
      explode(TextFunctions.tokens(lower(col("text")))).as("t"))

    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val tf = tok.filter(col("t").isin(terms: _*))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("t"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl"))

    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf") + lit(k1) *
      (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
    val contrib = idf * col("tf") * lit(k1 + 1.0) / norm

    val scored = tf.join(broadcast(dfreq), Seq("t"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(corpus))
      .groupBy(col("doc_id"))
      .agg(round(sum(contrib), 4).as("score"),
        count(lit(1)).as("n_matched"))
    // top-k via distributed TakeOrderedAndProject (per-partition heaps,
    // no global sort/window over |docs| rows); rank only the k survivors
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    scored.orderBy(col("score").desc, col("doc_id")).limit(topK)
      .withColumn("rank", row_number().over(w).cast("int"))
      .select(col("doc_id"), col("score"), col("n_matched"), col("rank"))
  }
}
