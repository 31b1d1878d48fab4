package graft.multimodal

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Multimodal plumbing: opaque-binary schema, mapPartitions decode
  * shape, bounded frame sampling, and the media→embedding→ANN path.
  * The decode kernel is the documented deterministic stub; these tests
  * pin the CONTRACT a real codec implementation must satisfy. */
class MultimodalSpec extends SparkSpec {
  import testImplicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def media = Multimodal.syntheticMedia(spark, sfDir)

  test("synthetic media table: opaque binary content with kind routing") {
    val m = media
    assert(m.schema("content").dataType.typeName == "binary")
    val kinds = m.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet == Set("image", "audio", "video"))
    assert(kinds.values.sum == 500)
  }

  test("decode: one row per media, deterministic metadata, binary dropped") {
    val d1 = Multimodal.decode(media, "media_id", "content")
    val d2 = Multimodal.decode(media, "media_id", "content")
    assert(d1.count() == 500)
    assert(d1.schema.fieldNames.sameElements(
      Array("media_id", "width", "height", "format", "pixel_hash")))
    // deterministic: same bytes → same decode on every run
    assert(d1.orderBy("media_id").collect().sameElements(
      d2.orderBy("media_id").collect()))
    val row = d1.filter(col("media_id") === 0).head()
    assert(row.width >= 16 && row.height >= 16)
    assert(Set("png", "jpeg").contains(row.format))
  }

  test("decode: custom decoder plugs in without plan changes") {
    val fixed = new Multimodal.MediaDecoder {
      override def decode(bytes: Array[Byte]): (Int, Int, String, Long) =
        (640, 480, "tiff", bytes.length.toLong)
    }
    val out = Multimodal.decode(media, "media_id", "content", fixed)
      .filter(col("media_id") === 3).head()
    assert(out.width == 640 && out.format == "tiff")
  }

  test("frameSample: at most maxFrames per media, offsets strided, deterministic") {
    val frames = Multimodal.frameSample(media, "media_id", "content",
      frameBytes = 100, maxFrames = 4)
    val perMedia = frames.groupBy("media_id").count().collect().map(_.getLong(1))
    assert(perMedia.forall(n => n >= 1 && n <= 4))
    val f = frames.filter(col("media_id") === 0).orderBy("frame_idx").collect()
    f.zipWithIndex.foreach { case (r, i) =>
      assert(r.frame_idx == i)
      assert(r.frame_offset == i * 100L)
    }
  }

  test("embed: fixed-dim vectors feed the ANN top-k path end-to-end") {
    val embs = Multimodal.embed(media, "media_id", "content", dims = 64).toDF()
    assert(embs.head().getAs[scala.collection.Seq[Float]]("embedding").length == 64)
    // media embeddings flow into the similarity operators unchanged
    val top = Similarity.topK(embs, "media_id", "embedding", queryId = 0L, k = 5)
      .collect()
    assert(top.length == 5)
    assert(top.forall(r => r.getDouble(1) <= 1.0 && r.getDouble(1) >= -1.0))
  }

  test("decode runs partition-parallel (no driver-side loop)") {
    val parts = media.repartition(7)
    val decoded = Multimodal.decode(parts, "media_id", "content")
    assert(decoded.rdd.getNumPartitions == 7)
    assert(decoded.count() == 500)
  }
}
