package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lineage-evaluation probe for the Budgeted dedup/ANN entry points
  * (r18 verdict item 4): over a DERIVED input — a frame with real
  * upstream work, not a raw parquet scan — every sizing pass
  * re-executes the upstream pipeline. The r18 shape evaluated the
  * lineage three times (count, occupancy histogram, pair enumeration);
  * r19's `knownN` parameter lets a caller who already knows the corpus
  * count (or persisted + counted the input) drop the count pass. This
  * probe measures exactly that: it instruments the derived stage's
  * FILTER predicate with an accumulator (a filter cannot be
  * column-pruned away, so the counter ticks once per input row per
  * lineage evaluation) and reports passes = ticks / input rows for the
  * default arm vs the knownN arm, plus wall and the answer hash — the
  * committed evidence that knownN removes one full upstream execution
  * with an invariant answer.
  *
  * Usage: runMain graft.BudgetPassProbe [sfDir]   (default 10× heaps)
  */
object BudgetPassProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scale10_heaps"))
    val spark = graft.core.Sessions.local("graft-budget-pass-probe")
    import graft.GoldenGen.ModelParams._

    def f2(d: Double) = math.round(d * 100.0) / 100.0
    val fields = scala.collection.mutable.ArrayBuffer[String]()

    /** Run `mk(derived)` where `derived` is the docs frame behind an
      * accumulator-instrumented filter; returns (passes, wall s,
      * result rows) with passes = filter evaluations / input rows. */
    def measure(name: String, mk: DataFrame => DataFrame): Unit = {
      val acc = spark.sparkContext.longAccumulator(s"probe_$name")
      val tick = udf { (s: String) => acc.add(1L); s != null && s.nonEmpty }
      val base = graft.core.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      val derived = base
        .withColumn("text", concat(col("text"), lit(" r19pass")))
        .where(tick(col("text")))
      val nBase = base.count() // un-instrumented denominator
      acc.reset()
      val t0 = System.nanoTime()
      val out = mk(derived).count()
      val wall = f2((System.nanoTime() - t0) / 1e9)
      val passes = math.round(acc.value.toDouble / nBase * 100.0) / 100.0
      println(s"[budgetpass] $name passes=$passes wall=${wall}s rows=$out " +
        s"(ticks=${acc.value} over $nBase input rows)")
      fields += s""""${name}":{"passes":$passes,"wall_s":$wall,"rows":$out}"""
    }

    // capAbove forced below this corpus so the histogram arm engages
    // (the oracle scales stay capless — this probes the SCALE path);
    // streamPerDoc large enough that the chosen cap keeps the
    // enumeration cheap at probe size
    val capAbove = 1000L
    val n = graft.core.Tables.documents(spark, sfDir).count()
    measure("t08_default", d =>
      graft.operators.Dedup.simHashPairsBudgeted(d, "text", "doc_id",
        SimHamming, streamPerDoc = 2048.0, capAbove = capAbove))
    measure("t08_knownN", d =>
      graft.operators.Dedup.simHashPairsBudgeted(d, "text", "doc_id",
        SimHamming, streamPerDoc = 2048.0, capAbove = capAbove,
        knownN = Some(n)))
    println(s"""{"metric":"budget_pass_probe","sf":"$sfDir","n":$n,${fields.mkString(",")}}""")
    spark.stop()
  }
}
