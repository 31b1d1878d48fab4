package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-containment (range) join — the second join Spark's planner
  * has no good physical strategy for (with [[AsOfJoin]]): left POINTS
  * against right INTERVALS `[lo, hi)` sharing an equi-key. Catalyst
  * plans the non-equi predicate as BroadcastNestedLoop when the interval
  * side is small and degenerates toward a cartesian product when it is
  * not — |L|·|R| comparisons either way.
  *
  * Bucketized plan: pick a bucket width `w`; every interval is exploded
  * over the `(hi − lo)/w + 1` buckets it overlaps, every point maps to
  * exactly ONE bucket (`floor(pt/w)`), and the join becomes an EQUI-join
  * on `(keys…, bucket)` with a cheap residual containment filter.
  * Comparisons drop to |L| × (intervals overlapping the point's bucket),
  * the join shuffles/broadcasts like any equi-join (AQE, skew handling,
  * broadcast all apply), and the explode factor is bounded by
  * `interval_span/w`. Pick `w` near the typical interval length: smaller
  * w explodes the interval side, larger w packs more intervals per
  * bucket into the residual filter.
  *
  * Columns are LONG (callers convert timestamps with `unix_micros`);
  * intervals are half-open `[lo, hi)`. Inner-join semantics: points
  * contained by no interval are dropped (wrap with a left anti/semi
  * pattern for outer behavior). Intervals with `hi <= lo` match nothing;
  * null bounds or points never match. One corrupt/sentinel interval
  * (hi near Long.MaxValue) would otherwise explode span/bucketWidth
  * rows and OOM the task — any interval wider than `maxBuckets` buckets
  * FAILS the job loudly (raise_error) rather than silently exploding or
  * silently dropping data; callers with genuine ultra-wide intervals
  * raise `bucketWidth` (or `maxBuckets` deliberately). */
object RangeJoin {

  def interval(left: DataFrame, right: DataFrame, keys: Seq[String],
               ptCol: String, loCol: String, hiCol: String,
               bucketWidth: Long, maxBuckets: Long = 1L << 16): DataFrame = {
    require(bucketWidth > 0, "interval: bucketWidth must be positive")
    require(maxBuckets > 0, "interval: maxBuckets must be positive")
    val l = left.withColumn("__bucket", floor(col(ptCol) / bucketWidth))
    val nBuckets =
      floor((col(hiCol) - 1) / bucketWidth) - floor(col(loCol) / bucketWidth) + 1
    val r = right
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) < col(hiCol))
      .filter(when(nBuckets > maxBuckets,
        raise_error(format_string(
          "RangeJoin.interval: interval [%d,%d) spans %d buckets" +
            " > maxBuckets=" + maxBuckets +
            " at bucketWidth=" + bucketWidth +
            " — corrupt bound, or raise bucketWidth/maxBuckets",
          col(loCol), col(hiCol), nBuckets)).cast("boolean"))
        .otherwise(lit(true)))
      .withColumn("__bucket",
        explode(sequence(floor(col(loCol) / bucketWidth),
          floor((col(hiCol) - 1) / bucketWidth))))
    l.join(r, keys :+ "__bucket")
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__bucket")
  }
}
