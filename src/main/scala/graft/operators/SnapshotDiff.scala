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
    * (idCol, status ∈ added|removed|changed|unchanged). */
  def diff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val id = col(idCol)
    val o = oldSnap.select(id, TextFunctions.fingerprint(col(textCol)).as("old_fp"))
    val n = newSnap.select(id, TextFunctions.fingerprint(col(textCol)).as("new_fp"))
    o.join(n, Seq(idCol), "full_outer")
      .select(id,
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") =!= col("new_fp"), "changed")
          .otherwise("unchanged").as("status"))
  }
}
