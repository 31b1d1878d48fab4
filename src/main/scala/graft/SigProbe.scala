package graft

import org.apache.spark.sql.functions._

/** One-off signature-entropy probe for the t08 scale question (round-17
  * verdict item #1): how many DISTINCT SimHash signatures does each
  * corpus actually have, and how are docs distributed over them? If the
  * signature space is low-entropy (correlated token distributions →
  * few distinct signatures), the saturated block-collision stream the
  * r16 probes measured (99.7 B rows at 100× heaps) is dominated by
  * doc-multiplicity, and a distinct-signature pre-join collapse cuts it
  * quadratically in the mean group size — with EXACT recall, unlike
  * occupancy caps.
  *
  * Usage: tools/runmain.sh graft.SigProbe <sfDir> [<sfDir> ...]
  */
object SigProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("graft-sig-probe")
    for (dir <- args) {
      val planted = graft.queries.LlmQueries.plantedCorpus(spark, dir)
      val sigs = graft.operators.Dedup.simHash(planted, "text", "doc_id")
      val groups = sigs.groupBy(col("simhash")).agg(count(lit(1)).as("m"))
      val row = groups.agg(
        count(lit(1)).as("distinct_sigs"),
        sum(col("m")).as("docs"),
        sum(col("m") * col("m")).as("sum_m2"),
        max(col("m")).as("max_group"),
        expr("approx_percentile(m, array(0.5, 0.9, 0.99))").as("pcts")
      ).head()
      val top = groups.orderBy(col("m").desc).limit(5)
        .collect().map(r => r.getLong(1)).mkString(",")
      println(s"""{"metric":"sig_entropy","sf":"$dir","distinct_sigs":${row.getLong(0)},"docs":${row.getLong(1)},"sum_m2":${row.getLong(2)},"max_group":${row.getLong(3)},"top5":[$top]}""")
    }
    spark.stop()
  }
}
