package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout helpers for multi-dimensional scan pruning — the
  * lakehouse Z-ORDER technique (public: Databricks OPTIMIZE ZORDER,
  * Apache Iceberg/Hudi clustering): interleave the bits of two bucket
  * coordinates into one Morton value, sort/partition the table by it,
  * and range pruning on the z-value bounds BOTH dimensions at once —
  * each parquet row group then covers a small rectangle of the
  * (x, y) space instead of a full stripe, so min/max statistics prune
  * scans with predicates on EITHER column.
  *
  * The reference engine has no layout control (single-node pandas);
  * this is part of the 100 TB extension surface: at cluster scale the
  * difference between "query reads 2% of row groups" and "query reads
  * 100%" IS the layout.
  *
  * Implementation is pure integer arithmetic (shifts/masks summed over
  * a fixed bit width), so it is whole-stage-codegen'd, shuffle-free,
  * and exactly reproducible in any engine — the t48 oracle replays it
  * in SQL verbatim. */
object Layout {

  /** Morton (Z-curve) interleave of two non-negative bucket ids over
    * `bits` bits each: bit i of `x` lands at position 2i, bit i of `y`
    * at 2i+1. Out-of-range coordinates are masked into range (callers
    * bucket first; masking keeps the expression total). */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xb = x.cast("long").bitwiseAND(lit((1L << bits) - 1))
    val yb = y.cast("long").bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).map { i =>
      shiftleft(shiftright(xb, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yb, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Hilbert index of two non-negative bucket ids — the
    * locality-better curve (every step is grid distance 1, no Z-curve
    * jumps, so a value range bounds a tighter rectangle). Backed by
    * the native [[graft.expr.GraftHilbert]] kernel: the per-bit
    * rotation recurrence feeds each level's x/y into the next twice,
    * which makes an unrolled Column tree exponential in `bits` — the
    * codegen'd loop is O(bits) per row. */
  def hilbertValue(x: Column, y: Column, bits: Int = 16): Column =
    call_function("graft_hilbert", x.cast("long"), y.cast("long"), lit(bits))

  /** Everything a reader needs to prune a clustered table: the linear
    * bucketizer bounds plus the curve parameters. Six numbers + two
    * flags — [[clusteredWrite]] persists it as `_graft_layout.json`
    * inside the table directory (underscore-prefixed files are
    * invisible to Spark's parquet reader, the `_SUCCESS` convention),
    * and [[readLayout]] restores it, so any session can prune a table
    * it didn't write. It IS the "stats index" of this layout; losing
    * it degrades reads to full scans, never to wrong answers, because
    * [[prunedRead]] re-applies the raw predicate after pruning. */
  final case class CurveLayout(xMin: Double, xMax: Double,
                               yMin: Double, yMax: Double,
                               bits: Int, partBits: Int,
                               hilbert: Boolean)

  private def layoutMetaPath(tablePath: String) =
    java.nio.file.Paths.get(tablePath, "_graft_layout.json")

  private def writeLayoutMeta(tablePath: String, l: CurveLayout): Unit = {
    // java.lang.Double.toString round-trips exactly via parseDouble, so
    // the restored bucketizer is bit-identical to the writer's
    val json =
      s"""{"xMin":${l.xMin},"xMax":${l.xMax},"yMin":${l.yMin},"yMax":${l.yMax},""" +
        s""""bits":${l.bits},"partBits":${l.partBits},"hilbert":${l.hilbert}}"""
    java.nio.file.Files.write(layoutMetaPath(tablePath),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Restore the [[CurveLayout]] a [[clusteredWrite]] left inside the
    * table directory. Fails loudly when absent — the caller is about
    * to prune with it, and a silent default would enumerate the wrong
    * directories (a correctness-neutral but scan-everything surprise
    * better surfaced as an error). */
  def readLayout(tablePath: String): CurveLayout = {
    val p = layoutMetaPath(tablePath)
    require(java.nio.file.Files.exists(p),
      s"no _graft_layout.json under $tablePath — not a clusteredWrite table?")
    val json = new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
    def num(k: String): String =
      (s""""$k":(-?[0-9.eE+-]+|true|false)""").r.findFirstMatchIn(json)
        .getOrElse(throw new IllegalArgumentException(
          s"malformed layout metadata (missing $k): $json"))
        .group(1)
    CurveLayout(num("xMin").toDouble, num("xMax").toDouble,
      num("yMin").toDouble, num("yMax").toDouble,
      num("bits").toInt, num("partBits").toInt, num("hilbert").toBoolean)
  }

  /** Column names the clustered table adds; inputs must not use them. */
  private val reservedCols = Set("_zv", "_zpart")

  private def bucketCol(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val n = 1L << bits
    if (hi <= lo) lit(0L)
    else least(lit(n - 1), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(n.toDouble))
        .cast("long")))
  }

  /** Driver-side twin of [[zValue]] for partition enumeration. */
  private def mortonXy2d(bits: Int, x: Long, y: Long): Long = {
    var d = 0L
    var i = 0
    while (i < bits) {
      d |= ((x >> i) & 1L) << (2 * i)
      d |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    d
  }

  /** Physically cluster `df` on the space-filling curve over
    * (`xCol`, `yCol`) and write it as parquet — the step that turns
    * [[zValue]]/[[hilbertValue]] from a computed key into an actual
    * LAYOUT:
    *
    *   1. one control-plane aggregate reads min/max of both columns
    *      (four scalars — the only driver-side data);
    *   2. both columns are linearly bucketized into the 2^bits grid
    *      and the curve value `_zv` computed (scan-stage, codegen'd);
    *   3. rows are `repartitionByRange` on `_zv` into 2^partBits
    *      tasks and sorted by `_zv` within each, so every parquet
    *      row group covers a tight (x, y) rectangle and carries
    *      min/max stats on `_zv`;
    *   4. the top `partBits` bits of `_zv` become the `_zpart`
    *      directory column — Spark's partition pruning then skips
    *      whole directories for rectangle predicates via
    *      [[prunedRead]], and the parquet reader's row-group stats
    *      on `_zv` prune within the touched files.
    *
    * Scale shape: one range shuffle (the sort you'd pay for ANY
    * clustered write), file count bounded by 2^partBits × (AQE task
    * splits), no driver-side data. At 100 TB raise `partBits` so a
    * directory stays a few GB; `bits` only affects key resolution,
    * not memory. */
  def clusteredWrite(df: DataFrame, xCol: String, yCol: String,
                     path: String, useHilbert: Boolean = false,
                     bits: Int = 8, partBits: Int = 4): CurveLayout = {
    require(bits >= 1 && bits <= 16,
      s"clusteredWrite: bits must be in [1, 16] (2^bits buckets per dim), got $bits")
    require(partBits >= 1 && partBits <= 2 * bits,
      s"clusteredWrite: partBits must be in [1, 2*bits], got $partBits")
    reservedCols.foreach(c => require(!df.columns.contains(c),
      s"clusteredWrite: input already has reserved column '$c'"))
    val mm = df.agg(
      min(col(xCol).cast("double")), max(col(xCol).cast("double")),
      min(col(yCol).cast("double")), max(col(yCol).cast("double"))).head()
    require(!mm.isNullAt(0) && !mm.isNullAt(2),
      "clusteredWrite: x/y columns are all-NULL or the table is empty")
    val layout = CurveLayout(mm.getDouble(0), mm.getDouble(1),
      mm.getDouble(2), mm.getDouble(3), bits, partBits, useHilbert)
    val bx = bucketCol(col(xCol), layout.xMin, layout.xMax, bits)
    val by = bucketCol(col(yCol), layout.yMin, layout.yMax, bits)
    val zv = if (useHilbert) hilbertValue(bx, by, bits) else zValue(bx, by, bits)
    df.withColumn("_zv", zv)
      .withColumn("_zpart", shiftright(col("_zv"), 2 * bits - partBits))
      .repartitionByRange(1 << partBits, col("_zv"))
      .sortWithinPartitions(col("_zv"))
      .write.partitionBy("_zpart").parquet(path)
    writeLayoutMeta(path, layout)
    layout
  }

  /** Partition ids by brute cell walk: every bucket cell in the
    * rectangle, curve-mapped, top bits kept. O(area) = O(4^bits) driver
    * iterations — the small-bits fast path, and the semantic reference
    * the range decomposition is spec-checked against. */
  private[operators] def partsByCellWalk(layout: CurveLayout,
      bxLo: Long, bxHi: Long, byLo: Long, byHi: Long): Seq[Long] = {
    val shift = 2 * layout.bits - layout.partBits
    val parts = scala.collection.mutable.SortedSet.empty[Long]
    var bx = bxLo
    while (bx <= bxHi) {
      var by = byLo
      while (by <= byHi) {
        val d = if (layout.hilbert) graft.expr.Hilbert.xy2d(layout.bits, bx, by)
                else mortonXy2d(layout.bits, bx, by)
        parts += (d >> shift)
        by += 1
      }
      bx += 1
    }
    parts.toSeq
  }

  /** Partition ids by curve-range decomposition (the BIGMIN idea,
    * Tropf & Herzog 1981, expressed as quadtree descent): both curves
    * are quadtree curves — a depth-ℓ quadrant with cell prefix
    * (px, py) maps to ONE contiguous curve-value block of length
    * 4^(bits−ℓ) whose base is the order-ℓ curve index of the prefix
    * shifted up (Morton trivially; Hilbert by its recursive
    * construction — the prefix property is exhaustively spec-checked
    * against [[partsByCellWalk]]). Descend from the root: a quadrant
    * disjoint from the query rectangle is dropped with its whole
    * block; one fully inside contributes its block's partition span
    * without further descent; only PARTIALLY overlapping quadrants
    * recurse. Work is O(perimeter · bits) quadrants instead of the
    * cell walk's O(area) — what makes bits = 16 (finer row-group
    * pruning at 100 TB) enumerable in microseconds — and the result is
    * IDENTICAL to the cell walk: descent runs to single cells, never
    * rounding a partial quadrant up. */
  private[operators] def partsByCurveRanges(layout: CurveLayout,
      bxLo: Long, bxHi: Long, byLo: Long, byHi: Long): Seq[Long] = {
    val bits = layout.bits
    val shift = 2 * bits - layout.partBits
    val parts = scala.collection.mutable.SortedSet.empty[Long]
    def descend(level: Int, px: Long, py: Long): Unit = {
      val span = bits - level // quadrant side = 2^span cells
      val xLo = px << span; val xHi = ((px + 1L) << span) - 1
      val yLo = py << span; val yHi = ((py + 1L) << span) - 1
      if (xHi < bxLo || xLo > bxHi || yHi < byLo || yLo > byHi) return
      if (xLo >= bxLo && xHi <= bxHi && yLo >= byLo && yHi <= byHi) {
        // fully inside: the quadrant's contiguous curve block
        val base = (if (layout.hilbert) graft.expr.Hilbert.xy2d(level, px, py)
                    else mortonXy2d(level, px, py)) << (2 * span)
        var p = base >> shift
        val pHi = (base + (1L << (2 * span)) - 1) >> shift
        while (p <= pHi) { parts += p; p += 1 }
        return
      }
      descend(level + 1, px * 2, py * 2)
      descend(level + 1, px * 2 + 1, py * 2)
      descend(level + 1, px * 2, py * 2 + 1)
      descend(level + 1, px * 2 + 1, py * 2 + 1)
    }
    descend(0, 0, 0)
    parts.toSeq
  }

  /** Read a [[clusteredWrite]] table with a rectangle predicate
    * `xLo ≤ x ≤ xHi AND yLo ≤ y ≤ yHi`, pruned to exactly the
    * `_zpart` directories whose curve cells intersect the rectangle.
    * The raw predicate is re-applied after pruning, so the result is
    * identical to filtering an unclustered copy — pruning only
    * changes how much data the scan touches.
    *
    * Partition enumeration is driver-side pure integer arithmetic, no
    * data read: the O(area) cell walk up to bits = 8 (≤ 64 k
    * iterations — cheaper than recursion bookkeeping), the
    * O(perimeter · bits) curve-range decomposition above that. Both
    * produce the identical partition set (spec-pinned). */
  def prunedRead(spark: SparkSession, path: String, layout: CurveLayout,
                 xCol: String, yCol: String,
                 xLo: Double, xHi: Double,
                 yLo: Double, yHi: Double): DataFrame = {
    def b(v: Double, lo: Double, hi: Double): Long = {
      val n = 1L << layout.bits
      if (hi <= lo) 0L
      else math.min(n - 1, math.max(0L,
        math.floor((v - lo) / (hi - lo) * n).toLong))
    }
    val bxLo = b(xLo, layout.xMin, layout.xMax)
    val bxHi = b(xHi, layout.xMin, layout.xMax)
    val byLo = b(yLo, layout.yMin, layout.yMax)
    val byHi = b(yHi, layout.yMin, layout.yMax)
    val parts =
      if (layout.bits <= 8) partsByCellWalk(layout, bxLo, bxHi, byLo, byHi)
      else partsByCurveRanges(layout, bxLo, bxHi, byLo, byHi)
    spark.read.parquet(path)
      .where(col("_zpart").isin(parts: _*))
      .where(col(xCol).cast("double").between(xLo, xHi) &&
        col(yCol).cast("double").between(yLo, yHi))
  }
}
