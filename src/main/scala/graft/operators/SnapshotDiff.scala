package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus snapshot diff — the dataset-versioning audit step: given two
  * snapshots of a document table, classify every id as added / removed /
  * changed / unchanged by content fingerprint. Training-data pipelines
  * run this between crawl refreshes to bound incremental work (only
  * added+changed need re-processing) and to audit what a version bump
  * actually did.
  *
  * Scale shape: each side is reduced to (id, 32-hex md5) in its scan
  * stage — the full-outer join moves fingerprints, never text; one
  * id-keyed shuffle per side, AQE-coalesced. Classification is a pure
  * projection over the joined row. */
object SnapshotDiff {

  /** One row per id present in either snapshot:
    * (idCol, status ∈ added|removed|changed|unchanged). Presence is
    * tracked by explicit side markers, NOT fingerprint nullness — a
    * document with NULL text (md5 → NULL) must still classify by which
    * side(s) it appears on, and NULL↔non-NULL text counts as changed
    * (null-safe fingerprint comparison). */
  def diff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val id = col(idCol)
    val o = oldSnap.select(id,
      TextFunctions.fingerprint(col(textCol)).as("old_fp"),
      lit(true).as("in_old"))
    val n = newSnap.select(id,
      TextFunctions.fingerprint(col(textCol)).as("new_fp"),
      lit(true).as("in_new"))
    o.join(n, Seq(idCol), "full_outer")
      .select(id,
        when(!coalesce(col("in_old"), lit(false)), "added")
          .when(!coalesce(col("in_new"), lit(false)), "removed")
          .when(!(col("old_fp") <=> col("new_fp")), "changed")
          .otherwise("unchanged").as("status"))
  }
}
