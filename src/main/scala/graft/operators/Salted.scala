package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew mitigation by salting — the manual complement to the
  * session-wide AQE skew-join handling. AQE only splits skewed
  * partitions it can observe at shuffle boundaries of sort-merge joins;
  * salting works for aggregations and broadcast-ineligible joins too,
  * and on any Spark version/deployment where AQE is off.
  *
  *   - [[aggregate]]: two-phase algebraic aggregation — phase 1 groups
  *     on (keys, salt) so one hot key spreads over `salt` reducers,
  *     phase 2 merges the partials. Exact for count/sum/min/max
  *     (algebraic: partials merge losslessly).
  *   - [[join]]: replicate the dimension side `salt`× (explode) and
  *     scatter the fact side's hot keys across the replicas. The
  *     dimension must be small enough to replicate; the fact side never
  *     concentrates one key in one task.
  *
  * Salt assignment uses a deterministic per-row function; ANY
  * assignment yields identical results (the salt participates only in
  * intermediate grouping), which the spec asserts by equality with the
  * unsalted plans on a heavily skewed corpus.
  */
object Salted {

  private def saltCol(salt: Int) =
    pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong))

  /** Two-phase salted count/sum/min/max aggregation by `keys`. Output
    * columns: keys, then `n` (count), `sum_<c>`, `min_<c>`, `max_<c>`. */
  def aggregate(df: DataFrame, keys: Seq[String], salt: Int = 16,
                sums: Seq[String] = Nil, mins: Seq[String] = Nil,
                maxs: Seq[String] = Nil): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val phase1Aggs =
      count(lit(1)).as("__n") +:
        (sums.map(c => sum(col(c)).as(s"__sum_$c")) ++
          mins.map(c => min(col(c)).as(s"__min_$c")) ++
          maxs.map(c => max(col(c)).as(s"__max_$c")))
    val phase1 = df
      .withColumn("__salt", saltCol(salt))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(phase1Aggs.head, phase1Aggs.tail: _*)
    val phase2Aggs =
      sum(col("__n")).as("n") +:
        (sums.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")) ++
          mins.map(c => min(col(s"__min_$c")).as(s"min_$c")) ++
          maxs.map(c => max(col(s"__max_$c")).as(s"max_$c")))
    phase1.groupBy(keys.map(col): _*)
      .agg(phase2Aggs.head, phase2Aggs.tail: _*)
  }

  /** Salted equi-join: `facts ⋈ dim` on `factKey = dimKey`, with the
    * dimension replicated `salt`× so a hot fact key spreads over `salt`
    * tasks instead of landing in one. */
  def join(facts: DataFrame, factKey: String,
           dim: DataFrame, dimKey: String, salt: Int = 16): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val saltedFacts = facts.withColumn("__salt", saltCol(salt))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    saltedFacts.join(replicatedDim,
      col(factKey) === col(dimKey) && saltedFacts("__salt") === replicatedDim("__salt"))
      .drop("__salt")
  }
}
