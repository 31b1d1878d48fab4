package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Defaults are tuned for the local[32] test harness but every knob is the
  * one you would also set on a real cluster:
  *   - AQE on (runtime re-plan: coalesce shuffle partitions, skew-join split,
  *     dynamic broadcast) — the key to surviving 100 TB skew.
  *   - shuffle.partitions sized to the local core count; on a 1000-executor
  *     cluster this would be set to ~2-3x total cores instead.
  *   - UTC session timezone (the reference treats naive datetimes as UTC,
  *     see reference conv/scripts/udbf_file_analysis.py:135-143).
  */
object Sessions {

  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  /** Starting shuffle width BEFORE AQE coalescing. shuffle.partitions
    * alone is the wrong knob to grow with data: it is also the FLOOR
    * for every tiny shuffle. AQE's split is the right shape — start
    * every exchange at `initialPartitionNum` and let the coalescer
    * merge down to advisory-sized (64 MB) partitions — so small stages
    * still collapse to a handful of tasks while a 100× corpus's sorts
    * and aggregations fan out to 8× the cores instead of spilling 32
    * oversized partitions (the t16/t44 third-decade sort-spill was
    * exactly this: fixed 32-way sorts over 100× rows re-merging from
    * disk). On a real cluster this is sized ~2-3× total cores; locally
    * 8× local cores keeps per-partition sort buffers inside the heap at
    * the 100× probe scale. Env-overridable for probes. */
  def initialPartitions: String =
    sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS",
      (cpus.toInt * 8).toString)

  /** Engine defaults applied to ANY builder — cluster deployments bring
    * their own master/shuffle sizing and call this on their builder;
    * the configs below are the ones that hold at every scale. */
  def withEngineDefaults(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        initialPartitions)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Local harness builder: engine defaults + local-mode sizing.
    * (nanosAsLong: the corpus' events.ts is parquet TIMESTAMP(NANOS),
    * read as Long and converted by Tables.events.) */
  def builder(appName: String): SparkSession.Builder =
    withEngineDefaults(SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)

  def local(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
