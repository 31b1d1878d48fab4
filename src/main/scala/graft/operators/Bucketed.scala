package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketing helpers — the co-located-join path for keys that are
  * joined repeatedly (SURVEY.md "Partitioning & shuffle": big fact
  * tables bucketed on their join key shuffle ZERO bytes per join, which
  * is the difference between a nightly job and an impossible one at
  * 100 TB). Both sides must use the same bucket count and key; Spark
  * then plans a SortMergeJoin directly over the bucketed file scans
  * with no Exchange on either side. */
object Bucketed {

  /** Persist a DataFrame bucketed+sorted by the join key as a catalog
    * table (parquet). Repeated joins on `key` against any table
    * bucketed with the same count need no shuffle. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
