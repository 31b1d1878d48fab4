package graft.apps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{ConnectedComponents, Dedup, HtmlExtract, LineScrub,
  ParaDedup, TextNormalize}

/** End-to-end training-data curation: the composition a user of this
  * engine runs over a raw document corpus —
  *
  *   1. quality gate (composite score ≥ threshold),
  *   2. exact dedup (normalized-content fingerprint, min-id canonical),
  *   3. near-dup clustering (shingle-Jaccard pairs → connected
  *      components → keep the cluster minimum),
  *   4. deterministic stratified sample (N per language by content-hash
  *      order — reproducible across runs and engines).
  *
  * Every stage is one of the individually-oracled operators; this app
  * only wires them — and the whole composition is ITSELF oracled
  * end-to-end (query `t23_curation_pipeline` mirrors all four stages,
  * including the connected-components fixpoint, in one recursive DuckDB
  * SQL). Scale shape: stages 1-2 are scan+one-aggregation; stage 3
  * shuffles ids/shingles only (text never rides a wide stage); stage 4
  * is one window per stratum. [[run]] additionally reports per-stage
  * survivor counts (aggregate actions, no data collected).
  */
object CurationPipeline {

  final case class Report(
      nInput: Long, nAfterQuality: Long, nAfterExact: Long,
      nAfterNearDup: Long, nSampled: Long)

  private def qualityGate(docs: DataFrame, minQuality: Double): DataFrame =
    docs.filter(TextFunctions.qualityScore(col("text")) >= minQuality)

  private def exactDedup(df: DataFrame): DataFrame = {
    val keep = Dedup.exact(df, "text", "doc_id")
      .select(col("keep_id").as("doc_id"))
    df.join(keep, Seq("doc_id"), "left_semi")
  }

  private def canonicalByNearDup(df: DataFrame, threshold: Double,
      shingleSize: Int, maxDocFreq: Int,
      checkpoint: DataFrame => DataFrame): DataFrame = {
    val pairs = Dedup.jaccardPairs(df, "text", "doc_id", threshold,
      shingleSize = shingleSize, maxDocFreq = maxDocFreq)
    val clustered = ConnectedComponents.clusters(df, "doc_id", pairs,
      checkpoint = checkpoint)
    df.join(
      clustered.filter(col("doc_id") === col("cluster_id"))
        .select(col("doc_id")),
      Seq("doc_id"), "left_semi")
  }

  /** Adds the per-language content-hash rank `rn` and keeps rn ≤ n. */
  private def sample(df: DataFrame, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(md5(col("text")).asc_nulls_last, col("doc_id"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
  }

  /** The curated sample as one declarative DataFrame: (doc_id, lang,
    * rn), ordered. This is the oracled surface (t23).
    *
    * Density knobs — the near-dup stage's cost is proportional to
    * CANDIDATE-PAIR volume, not corpus size (PLANS.md §Measured
    * scaling), and candidate volume is what these bound on a dense
    * (self-similar) corpus:
    *   - `maxDocFreq`: a shingle shared by more than this many docs is
    *     treated as a stop-shingle and generates NO candidates; each
    *     surviving shingle enumerates ≤ maxDocFreq·(maxDocFreq−1)/2
    *     pairs in-place, so worst-case pairs ≤ that × #rare-shingles.
    *     Lowering it is the first lever when a corpus's vocabulary is
    *     narrow (the synthetic corpus here: ~30-word vocabulary → avg
    *     near-dup degree ~200 at threshold 0.8).
    *   - `jaccardThreshold`: raises the exact-verify bar AND (via the
    *     provable length prefilter min/max ≥ t) prunes candidates
    *     before the word-set join.
    *   - `shingleSize`: larger shingles are rarer — fewer blocking
    *     collisions, at the cost of missing short-document overlaps.
    * Recall contract: candidates require ≥1 shared RARE shingle, so a
    * lower `maxDocFreq` can only drop pairs whose every shared shingle
    * is a stop-shingle — near-identical docs always share rare ones.
    *
    * Fault tolerance — `checkpoint` governs how the exact-dedup
    * survivors AND every connected-components round are materialized.
    * The default lazy `localCheckpoint` stores blocks on executors with
    * TRUNCATED lineage: fastest on a healthy cluster, but the loss of
    * any executor mid-query is unrecoverable (the blocks cannot be
    * recomputed). On preemptible/spot clusters set
    * `spark.sparkContext.setCheckpointDir(<hdfs-path>)` and pass
    * `_.checkpoint(eager = false)` — rounds then persist to reliable
    * storage and survive executor loss, at one distributed write per
    * round. */
  def curate(docs: DataFrame,
             minQuality: Double = 0.3,
             jaccardThreshold: Double = 0.8,
             samplePerLang: Int = 100,
             shingleSize: Int = 3,
             maxDocFreq: Int = 20,
             checkpoint: DataFrame => DataFrame =
               _.localCheckpoint(eager = false)): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"), col("lang"))
    // the exact-dedup survivors feed MANY downstream branches (shingle
    // blocking, word sets, cluster join, sample); materializing them
    // once collapses ~6 re-executions of the quality+dedup subtree
    // (measured 13-26 s -> ~2 s at sf0.1). Lazy: the first downstream
    // action persists the blocks, every later branch reuses them.
    val exact = checkpoint(exactDedup(qualityGate(base, minQuality)))
    sample(canonicalByNearDup(exact, jaccardThreshold, shingleSize,
        maxDocFreq, checkpoint),
        samplePerLang)
      .select(col("doc_id"), col("lang"), col("rn"))
      .orderBy(col("lang"), col("rn"))
  }

  /** Crawl pre-pass: raw HTML pages → clean paragraph-structured text,
    * the composition a crawl snapshot runs BEFORE [[curate]] —
    *
    *   1. main-content extraction ([[HtmlExtract.extract]]: block
    *      segmentation + text/link-density classification),
    *   2. encoding repair / normalization ([[TextNormalize.clean]]:
    *      mojibake, controls, invisibles, NFC, space collapse),
    *   3. paragraph structure: content blocks become blank-line-
    *      separated paragraphs (each block is one whitespace-collapsed
    *      line, so '\n' → '\n\n' is exact),
    *   4. corpus-wide repeated-line scrub ([[LineScrub.scrub]]: a
    *      block whose text recurs in > `lineMaxDocFreq` distinct
    *      documents is cross-site boilerplate the density heuristics
    *      could not see),
    *   5. optionally ([[crawlPrePassWithParaDedup]]) paragraph-level
    *      MinHash near-dup scrub ([[ParaDedup.scrub]]) for the
    *      template variants exact matching misses.
    *
    * Output: (doc_id, text, n_lines, n_kept) — scrubbed text with
    * paragraph breaks preserved (feed `.curate()` after joining back
    * page metadata). Oracled end-to-end as `t67_crawl_pipeline`.
    *
    * Scale shape: stages 1-3 are ONE scan-stage projection (no UDF, no
    * shuffle — the plan stays FileScan → Project until the scrub's
    * `repartition(line)`, asserted in CurationPipelineSpec); stage 4
    * shuffles line text once and kept text once. At 100 TB the whole
    * pre-pass is two exchanges over post-extraction bytes. */
  def crawlPrePass(pages: DataFrame, idCol: String, htmlCol: String,
                   lineMaxDocFreq: Int = 50): DataFrame = {
    val cleaned = HtmlExtract.extract(pages, idCol, htmlCol)
      .select(col("doc_id"),
        regexp_replace(TextNormalize.clean(col("extracted_text")),
          "\n", "\n\n").as("text"))
    LineScrub.scrub(cleaned, "doc_id", "text", lineMaxDocFreq)
  }

  /** [[crawlPrePass]] + the paragraph near-dup scrub (stage 5): the
    * scrubbed text is already blank-line-paragraphed, so ParaDedup's
    * granularity is exactly the surviving content blocks. Returns
    * (doc_id, n_paras, n_kept, clean_text). */
  def crawlPrePassWithParaDedup(pages: DataFrame, idCol: String,
      htmlCol: String, lineMaxDocFreq: Int = 50,
      numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.7): DataFrame =
    ParaDedup.scrub(
      crawlPrePass(pages, idCol, htmlCol, lineMaxDocFreq),
      "doc_id", "text",
      numHashes = numHashes, bands = bands, threshold = threshold)

  /** Run the full curation flow and also report per-stage survivor
    * counts. Returns the curated documents (original columns).
    * Knobs as in [[curate]]. */
  def run(docs: DataFrame,
          minQuality: Double = 0.3,
          jaccardThreshold: Double = 0.8,
          samplePerLang: Int = 100,
          shingleSize: Int = 3,
          maxDocFreq: Int = 20,
          checkpoint: DataFrame => DataFrame =
            _.localCheckpoint(eager = false)): (DataFrame, Report) = {
    val base = docs.select(col("doc_id"), col("text"), col("lang"))
    val quality = qualityGate(base, minQuality)
    // see curate(): one materialization serves every downstream branch
    val exact = checkpoint(exactDedup(quality))
    val canonical = canonicalByNearDup(exact, jaccardThreshold,
      shingleSize, maxDocFreq, checkpoint)
    val sampled = sample(canonical, samplePerLang).drop("rn")
    val report = Report(
      nInput = base.count(),
      nAfterQuality = quality.count(),
      nAfterExact = exact.count(),
      nAfterNearDup = canonical.count(),
      nSampled = sampled.count())
    (sampled, report)
  }
}
