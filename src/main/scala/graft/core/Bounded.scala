package graft.core

import org.apache.spark.sql.{DataFrame, Row}

/** Driver-side collects with an EXPLICIT cardinality contract.
  *
  * The engine's design rule is "no driver-side data plane": the only
  * `.collect()` sites are control-plane reads whose cardinality is
  * structurally bounded (per-file channel list, per-trigger file batch,
  * LSH probe set, per-window stats rows). This helper makes each bound
  * load-bearing — a caller that violates its declared contract fails
  * loudly instead of silently materializing an unbounded frame on the
  * driver (the classic 100 TB scale-killer).
  */
object Bounded {

  /** Collect at most `max` rows; throws if the frame has more. The limit
    * is pushed into the plan (`limit(max + 1)`), so even a violating call
    * never ships more than `max + 1` rows to the driver. */
  def collect(df: DataFrame, max: Int, site: String): Array[Row] = {
    require(max >= 0, s"$site: bound must be non-negative, got $max")
    val rows = df.limit(max + 1).collect()
    if (rows.length > max) throw new IllegalStateException(
      s"$site: driver-side collect exceeded its cardinality contract " +
        s"(> $max rows) — this site is control-plane only; " +
        "route data-plane results through a distributed sink instead")
    rows
  }
}
