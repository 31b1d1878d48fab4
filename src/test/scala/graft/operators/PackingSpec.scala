package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Context-window packing invariants: offsets tile each stream exactly,
  * window indices follow from integer arithmetic, zero-token docs are
  * excluded, and the layout is deterministic. */
class PackingSpec extends SparkSpec {
  import testImplicits._

  test("hand-built stream: offsets and window spans tile exactly") {
    // one stratum, one shard: docs of 3, 4, 2 tokens into ctx=4 windows
    // stream:  [d1 d1 d1 | d2] [d2 d2 d2 | d3] [d3]
    val df = Seq(
      (0L, "a", "w w w"),
      (4L, "a", "w w w w"),
      (8L, "a", "w w")).toDF("id", "lang", "text")
    val out = Packing.contextPack(df, "id", "text", "lang",
        ctxLen = 4, shards = 1)
      .orderBy(col("id")).collect()
    // (seq_first, seq_last, offset_in_seq)
    assert(out.map(r => (r.getLong(4), r.getLong(5), r.getLong(6))).toSeq ===
      Seq((0L, 0L, 0L), (0L, 1L, 3L), (1L, 2L, 3L)))
  }

  test("corpus invariants: contiguous tiling per stream, no empty docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Packing.contextPack(docs, "doc_id", "text", "lang",
      ctxLen = 128, shards = 4)
    assert(out.filter(col("n_tokens") < 1).count() === 0)
    // per stream, sorted by doc_id: each doc starts where the previous
    // ended (stream_end reconstruction from offset/window arithmetic)
    val rows = out.select(col("lang"), col("shard"), col("doc_id"),
        col("n_tokens"), (col("seq_first") * 128 + col("offset_in_seq")).as("start"))
      .collect()
      .groupBy(r => (r.getString(0), r.getInt(1)))
    rows.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(2))
      sorted.foldLeft(0L) { (expectStart, r) =>
        assert(r.getLong(4) === expectStart,
          s"doc ${r.getLong(2)} starts at ${r.getLong(4)}, expected $expectStart")
        expectStart + r.getLong(3)
      }
    }
    // seq_last is derived: (start + n_tokens - 1) / ctx
    val bad = out.filter(
      col("seq_last") =!= floor((col("seq_first") * 128 + col("offset_in_seq")
        + col("n_tokens") - 1) / 128)).count()
    assert(bad === 0)
  }

  test("sharding spreads streams and preserves totals") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val one = Packing.contextPack(docs, "doc_id", "text", "lang", 128, shards = 1)
    val four = Packing.contextPack(docs, "doc_id", "text", "lang", 128, shards = 4)
    // same docs, same token counts — only the stream assignment differs
    assert(one.count() === four.count())
    assert(one.agg(sum("n_tokens")).head.getLong(0) ===
      four.agg(sum("n_tokens")).head.getLong(0))
    assert(four.select(col("shard")).distinct().count() === 4)
  }
}
