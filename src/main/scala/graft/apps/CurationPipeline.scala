package graft.apps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{ConnectedComponents, Dedup}

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
  * only wires them. Scale shape: stages 1-2 are scan+one-aggregation;
  * stage 3 shuffles ids/shingles only (text never rides a wide stage);
  * stage 4 is one window per stratum. The returned [[Report]] carries
  * per-stage survivor counts (aggregate actions, no data collected).
  */
object CurationPipeline {

  final case class Report(
      nInput: Long, nAfterQuality: Long, nAfterExact: Long,
      nAfterNearDup: Long, nSampled: Long)

  /** Run the full curation flow over (doc_id, text, lang) documents.
    * Returns the curated sample and the per-stage survivor counts. */
  def run(docs: DataFrame,
          minQuality: Double = 0.3,
          jaccardThreshold: Double = 0.8,
          samplePerLang: Int = 100): (DataFrame, Report) = {
    val base = docs.select(col("doc_id"), col("text"), col("lang"))

    // 1. quality gate — pure scan-side Column expressions
    val quality = base
      .filter(TextFunctions.qualityScore(col("text")) >= minQuality)

    // 2. exact dedup — keep the min doc_id of every normalized-content
    // group (left-semi join back: only ids travel)
    val exactKeep = Dedup.exact(quality, "text", "doc_id")
      .select(col("keep_id").as("doc_id"))
    val exact = quality.join(exactKeep, Seq("doc_id"), "left_semi")

    // 3. near-dup clustering — pairs on the survivors, components, keep
    // each cluster's minimum id
    val pairs = Dedup.jaccardPairs(exact, "text", "doc_id",
      threshold = jaccardThreshold)
    val clustered = ConnectedComponents.clusters(exact, "doc_id", pairs)
    val canonical = exact.join(
      clustered.filter(col("doc_id") === col("cluster_id"))
        .select(col("doc_id")),
      Seq("doc_id"), "left_semi")

    // 4. deterministic stratified sample — content-hash order per lang
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(md5(col("text")), col("doc_id"))
    val sampled = canonical
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= samplePerLang)
      .drop("__rn")

    val report = Report(
      nInput = base.count(),
      nAfterQuality = quality.count(),
      nAfterExact = exact.count(),
      nAfterNearDup = canonical.count(),
      nSampled = sampled.count())
    (sampled, report)
  }
}
