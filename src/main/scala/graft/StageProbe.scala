package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-level wall decomposition for named bench queries whose
  * full-query walls need attributing to a subtree (r17 verdict items 3
  * and 5): t26's +2 s round-over-round drift (blocking aggregate vs
  * the double merge-hinted text join) and t85's 4.44×/decade growth at
  * the fourth decade (edge-stream scan vs the distinct vs the
  * fixed-cost label rounds). Each stage is timed as its own action on
  * a fresh plan — stage walls OVERLAP (later stages re-run earlier
  * subtrees), so the reading is "stage N − stage N−1", same convention
  * as the CandidateProbe families.
  *
  * Usage: runMain graft.StageProbe [t26|t85 ...]   (default: both)
  *   SPARK_GRAFT_SF_DIR  corpus dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_REPEAT  repeats per stage (default 2; min reported)
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2").toInt
    val fams: Set[String] = if (args.nonEmpty) args.toSet else Set("t26", "t85")
    val spark = graft.core.Sessions.local("graft-stage-probe")
    import graft.operators.{Dedup, LabelProp}

    val fields = scala.collection.mutable.ArrayBuffer[String]()
    def timed(name: String)(df: => DataFrame): Unit = {
      val walls = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        val n = df.queryExecution.toRdd.count()
        (n, math.round((System.nanoTime() - t0) / 1e6) / 1e3)
      }
      val n = walls.head._1
      val best = walls.map(_._2).min
      println(s"[stageprobe] $name n=$n first=${walls.head._2}s best=${best}s")
      fields += s""""$name":{"n":$n,"first":${walls.head._2},"best":$best}"""
    }

    if (fams("t26")) {
      // the t26 corpus: docs ∪ 'pre <text> post' wrappers (id + 2e6)
      val docs = graft.core.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      val wrapped = docs.unionAll(docs.select(
        (col("doc_id") + 2000000L).as("doc_id"),
        concat(lit("pre "), col("text"), lit(" post")).as("text")))
      // 1. raw shingle stream (explode + hash, pre-aggregate)
      timed("t26_shingle_stream")(wrapped.select(col("doc_id"),
        explode(graft.functions.TextFunctions.shingles(col("text"), 3)).as("sh"))
        .select(col("doc_id"), xxhash64(col("sh")).as("shingle")))
      // 2. blocking aggregate + pair enumeration + distinct
      timed("t26_candidates")(Dedup.shingleCandidates(wrapped, 3, 20))
      // 3. full query: candidates + double merge-hinted text join + verify
      timed("t26_full")(Dedup.containmentPairs(wrapped, "text", "doc_id"))
    }

    if (fams("t85")) {
      val docs = graft.core.Tables.documents(spark, sfDir).select(col("doc_id"))
      val id = col("doc_id")
      def edges = docs
        .select((id % 25).as("src"), (expr("doc_id div 25") % 25).as("dst"))
        .union(docs.select((lit(100) + (id * 3 + 1) % 25).as("src"),
          (lit(100) + (expr("doc_id div 25") + 7) % 25).as("dst")))
        .union(docs.where(id % 97 === 0)
          .select((id % 25).as("src"), (lit(100) + id % 25).as("dst")))
      // 1. the raw edge stream (scan + union + projections)
      timed("t85_edge_stream")(edges)
      // 2. + the undirected distinct (partial agg collapses to ~600 keys)
      timed("t85_und_distinct")(edges
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .where(col("a") =!= col("b")).distinct())
      // 3. setup only: adj checkpoint + initial labels, zero rounds
      timed("t85_rounds0")(LabelProp.communities(edges, 0))
      // 4/5. full at 4 and 8 rounds — the spread isolates per-round
      // fixed cost (two tiny exchanges + a localCheckpoint per round)
      timed("t85_rounds4")(LabelProp.communities(edges, 4))
      timed("t85_rounds8")(LabelProp.communities(edges, 8))
    }

    println(s"""{"metric":"stage_probe","sf":"$sfDir",${fields.mkString(",")}}""")
    spark.stop()
  }
}
