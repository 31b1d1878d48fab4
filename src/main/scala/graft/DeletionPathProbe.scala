package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Composed near-dup DELETION-PATH probe: simhash pairs → connected
  * components → keep-min survivors, timed end-to-end with shuffle
  * telemetry. Exists to answer the standing scale question about t08:
  * its pair set grows ~quadratically with corpus density (402 M pairs
  * at the 100× corpus vs 70 k at sf0.1), but a deletion pipeline never
  * materializes those pairs as an ANSWER — they are a shuffle-bounded
  * intermediate feeding [[graft.operators.ConnectedComponents]], whose
  * contraction collapses them to ≤ one (node, root) row per node per
  * partition before the first distinct. This probe measures that
  * claim: wall, produced pair count (from the CC input side), survivor
  * count, and total + peak-stage shuffle write bytes.
  *
  * Usage: runMain graft.DeletionPathProbe [sfDir]
  *   (env SPARK_GRAFT_SF_DIR honored when no arg; defaults sf0.1)
  */
object DeletionPathProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = graft.core.Sessions.local("graft-deletion-probe")
    val shuffleWrite = new LongAdder
    val shuffleRead = new LongAdder
    @volatile var peakStageShuffleWrite = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleWrite.add(m.shuffleWriteMetrics.bytesWritten)
          shuffleRead.add(m.shuffleReadMetrics.totalBytesRead)
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val w = s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        if (w > peakStageShuffleWrite) peakStageShuffleWrite = w
      }
    })
    val docs = graft.core.Tables.documents(spark, sfDir)
    val load0 = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

    val t0 = System.nanoTime()
    // the composed pipeline under test — pairs NEVER hit the driver or
    // a sink; they flow straight into CC's contraction
    val pairs = graft.operators.Dedup.simHashPairs(docs, "text", "doc_id")
      .select(col("left_id"), col("right_id"))
    val clusters = graft.operators.ConnectedComponents
      .clusters(docs, "doc_id", pairs)
    // keep-min deletion: survivors = docs whose id IS the cluster min
    val survivors = clusters.filter(col("doc_id") === col("cluster_id"))
    val nSurvivors = survivors.count()
    val wall = (System.nanoTime() - t0) / 1e9
    // snapshot the shuffle telemetry NOW, before the out-of-band
    // pair/doc counts below add their own shuffle — the emitted numbers
    // must cover exactly the timed composed run, or the probe's
    // "shuffle-bounded" claim includes the very pair-dump cost it
    // exists to exclude
    val composedShuffleWrite = shuffleWrite.sum
    val composedShuffleRead = shuffleRead.sum
    val composedPeakStage = peakStageShuffleWrite

    // answer-size context, measured OUTSIDE the timed composed run (a
    // deletion pipeline never pays this count; it is the number the
    // probe exists to show is irrelevant to the composed wall)
    val t1 = System.nanoTime()
    val nPairs = pairs.count()
    val pairWall = (System.nanoTime() - t1) / 1e9

    val nDocs = docs.count()
    def mb(b: Long) = math.round(b / 1e5) / 10.0
    println(s"""{"metric":"deletion_path_probe","sf":"$sfDir","docs":$nDocs,"survivors":$nSurvivors,"composed_wall_s":${math.round(wall * 10) / 10.0},"pair_count":$nPairs,"pair_dump_wall_s":${math.round(pairWall * 10) / 10.0},"shuffle_write_mb":${mb(composedShuffleWrite)},"shuffle_read_mb":${mb(composedShuffleRead)},"peak_stage_shuffle_write_mb":${mb(composedPeakStage)},"loadavg_start":${math.round(load0 * 100) / 100.0}}""")
    spark.stop()
  }
}
