package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Same-build A/B of the span-dedup window KEY representation — the
  * measurement behind the round-15 `SpanDedup` key swap (md5 32-hex
  * string → xxhash64 long). Round 14's fourth-decade probe measured
  * t42/t46 growing ~1.35×/decade under md5 keys and attributed the
  * superlinearity to corpus-wide sorts of 32-byte string keys; the
  * swap landed in round 15 with the A/B still owed (r15 verdict,
  * "dangling evidence citations"). This tool closes the loop inside
  * ONE JVM: the two arms are the IDENTICAL `duplicateSpans` plan —
  * verbatim body, merge-hinted unbounded joins, full-evaluation
  * `toRdd` sink — differing only in `k = xxhash64(gram)` vs
  * `k = md5(gram)` (the round-14 shape, byte-for-byte from git
  * history), run interleaved (xx, md5, xx, md5) so drift hits both
  * arms equally, with per-run shuffle-write telemetry so the "key
  * bytes dominate the shuffle" claim is measured, not inferred.
  *
  * Also checks answer parity once per corpus: the two arms must agree
  * on Σ n_windows and Σ n_dup_windows (xxhash64 collisions can in
  * principle differ — at 2⁻⁶⁵ per window pair — so parity here is the
  * collision-tolerance argument in `SpanDedup`'s scaladoc made
  * observable at the probed scale).
  *
  * Usage: runMain graft.SpanKeyAb [sfDir] [reps]
  *   (env SPARK_GRAFT_SF_DIR honored when no arg; defaults sf0.1)
  */
object SpanKeyAb {

  /** `SpanDedup.duplicateSpans` with the key expression as a parameter
    * — body otherwise verbatim (window 10, merge hints, left-join
    * back-fill) so each arm times the production plan shape. */
  private[graft] def profile(docs: DataFrame, key: Column => Column): DataFrame = {
    val id = col("doc_id")
    val wins = docs
      .select(id, explode(
        TextFunctions.ngramsRaw(lower(col("text")), 10)).as("gram"))
      .select(id, key(col("gram")).as("k"))
    val perDocKey = wins.groupBy(id, col("k")).agg(count(lit(1)).as("c"))
    val totals = perDocKey.groupBy(col("k")).agg(sum(col("c")).as("tot"))
    val per = perDocKey
      .join(totals.hint("merge"), "k")
      .groupBy(id)
      .agg(
        sum(col("c")).as("n_windows"),
        sum(when(col("tot") >= 2, col("c")).otherwise(0L)).as("n_dup_windows"))
    docs.select(id)
      .join(per, Seq("doc_id"), "left")
      .select(
        id,
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"))
      .withColumn("dup_fraction",
        when(col("n_windows") === 0, 0.0)
          .otherwise(round(col("n_dup_windows") / col("n_windows").cast("double"), 4)))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = graft.core.Sessions.local("graft-span-key-ab")

    val shuffleWrite = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) shuffleWrite.add(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    def cpuNanos: Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
        case _ => -1L
      }

    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val arms: Seq[(String, Column => Column)] =
      Seq("xxhash64" -> (g => xxhash64(g)), "md5" -> (g => md5(g)))

    // warm: JIT + parquet footers, off the clock (first arm alphabetical
    // would otherwise absorb it)
    docs.limit(1000).select(xxhash64(col("text")), md5(col("text"))).count()

    final case class Run(wall: Double, cpu: Double, shufMB: Double)
    val runs = scala.collection.mutable.Map[String, Vector[Run]]()
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { _ =>
      arms.foreach { case (name, key) =>
        // listener events are async (the bus is private[spark]) — a
        // short settle keeps MB-level telemetry attribution clean
        Thread.sleep(500)
        val s0 = shuffleWrite.sum
        val c0 = cpuNanos
        val t0 = System.nanoTime()
        profile(docs, key).queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500)
        val run = Run(wall,
          if (c0 < 0) -1.0 else (cpuNanos - c0) / 1e9,
          (shuffleWrite.sum - s0) / 1048576.0)
        runs(name) = runs(name) :+ run
        println(f"[spankeyab] $name wall=${run.wall}%.2fs cpu=${run.cpu}%.1fs shuffle_write=${run.shufMB}%.1fMB")
      }
    }

    // answer parity (untimed): identical aggregate profile under both
    // keys. Skippable for the heaviest corpora (it re-executes both
    // arms) once proven at a smaller factor — the collision math in
    // SpanDedup's scaladoc covers the extrapolation.
    val skipParity = sys.env.contains("SPANKEYAB_SKIP_PARITY")
    val sums = if (skipParity) Map.empty[String, (Long, Long)]
    else arms.map { case (name, key) =>
      val r = profile(docs, key)
        .agg(sum("n_windows"), sum("n_dup_windows")).head()
      name -> (r.getLong(0), r.getLong(1))
    }.toMap
    val parity = skipParity || sums("xxhash64") == sums("md5")

    def f2(d: Double) = math.round(d * 100.0) / 100.0
    val fields = arms.map(_._1).map { n =>
      val rs = runs(n)
      s""""${n}_first_s":${f2(rs.head.wall)},"${n}_best_s":${f2(rs.map(_.wall).min)},"${n}_cpu_s":${f2(rs.map(_.cpu).min)},"${n}_shuffle_mb":${f2(rs.map(_.shufMB).min)}"""
    }.mkString(",")
    val sumsField = if (skipParity) s""""parity":"skipped""""
      else s""""parity":$parity,"sums_xx":[${sums("xxhash64")._1},${sums("xxhash64")._2}],"sums_md5":[${sums("md5")._1},${sums("md5")._2}]"""
    println(s"""{"metric":"span_key_ab","sf":"$sfDir","reps":$reps,$fields,$sumsField}""")
    require(parity, "xxhash64 and md5 arms disagree on the span profile")
    spark.stop()
  }
}
