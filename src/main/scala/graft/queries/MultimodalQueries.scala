package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import QueryDef.sql

/** Multimodal-column queries over the synthetic opaque-media table
  * (documents' text bytes standing in for image/audio/video payloads —
  * the container ships no codecs, so the SQL-expressible halves of the
  * media pipeline are oracled here and the mapPartitions decode plumbing
  * is covered by MultimodalSpec). */
object MultimodalQueries {

  val all: Seq[QueryDef] = Seq(

    // opaque-binary metadata extraction: byte length + content digest
    // per media row, kind-routed — the scan-side half of a decode
    sql("u05_media_metadata")(
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  cast(strlen(text) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_fp
        |FROM documents
        |ORDER BY media_id""") { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id").as("media_id"),
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("kind"),
          length(col("text").cast("binary")).cast("long").as("n_bytes"),
          md5(col("text").cast("binary")).as("content_fp"))
        .orderBy(col("media_id"))
    },

    // frame sampling: bounded fixed-stride slices of each payload with
    // per-frame digests — the exploded (media, frame) contract
    sql("u06_frame_sample")(
      """SELECT media_id, frame_idx,
        |  md5(substring(text, frame_idx * 256 + 1, 256)) AS frame_fp
        |FROM (
        |  SELECT doc_id AS media_id, text,
        |    unnest(generate_series(0,
        |      least(7, greatest(0, length(text) // 256 - 1)))) AS frame_idx
        |  FROM documents) t
        |ORDER BY media_id, frame_idx""") { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id").as("media_id"), col("text"),
          explode(sequence(lit(0),
            least(lit(7), greatest(lit(0),
              floor(length(col("text")) / 256).cast("int") - 1)))).as("frame_idx"))
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
          md5(col("text").substr(col("frame_idx") * 256 + 1, lit(256))
            .cast("binary")).as("frame_fp"))
        .orderBy(col("media_id"), col("frame_idx"))
    },

    // audio-feature extraction: per-window RMS energy + peak over the
    // payload treated as 8-bit samples (the real shape of PCM feature
    // pipelines: bounded windows, one narrow explode, codegen'd agg —
    // values are code points so both engines decode identically).
    sql("u07_audio_energy")(
      """SELECT media_id, win_idx,
        |  round(sqrt(avg(v * v)), 4) AS rms,
        |  max(v) AS peak
        |FROM (
        |  SELECT doc_id AS media_id,
        |    (i - 1) // 64 AS win_idx,
        |    ascii(substring(text, i, 1))::DOUBLE AS v
        |  FROM (
        |    SELECT doc_id, text,
        |      unnest(range(1, least(length(text), 512) + 1)) AS i
        |    FROM documents WHERE length(text) > 0) s) w
        |GROUP BY media_id, win_idx
        |ORDER BY media_id, win_idx""") { (s, d) =>
      Tables.widened(Tables.documents(s, d))
        .filter(length(col("text")) > 0)
        .select(col("doc_id").as("media_id"), col("text"),
          explode(sequence(lit(1), least(length(col("text")), lit(512)))).as("i"))
        .select(col("media_id"),
          floor((col("i") - 1) / 64).cast("long").as("win_idx"),
          ascii(col("text").substr(col("i"), lit(1))).cast("double").as("v"))
        .groupBy(col("media_id"), col("win_idx"))
        .agg(round(sqrt(avg(col("v") * col("v"))), 4).as("rms"),
          max(col("v")).as("peak"))
        .orderBy(col("media_id"), col("win_idx"))
    },

    // frame-sequence temporal analysis: per-media scene-change count via
    // a lag window over the sampled frame digests — the (media, ordered
    // frames) shape every video pipeline reduces to; one shuffle on
    // media_id for the window + agg.
    sql("u08_scene_changes")(
      """WITH frames AS (
        |  SELECT media_id, frame_idx,
        |    md5(substring(text, frame_idx * 64 + 1, 64)) AS frame_fp
        |  FROM (
        |    SELECT doc_id AS media_id, text,
        |      unnest(generate_series(0,
        |        least(15, greatest(0, length(text) // 64 - 1)))) AS frame_idx
        |    FROM documents) t
        |),
        |lagged AS (
        |  SELECT media_id, frame_fp,
        |    lag(frame_fp) OVER (PARTITION BY media_id ORDER BY frame_idx) AS prev_fp
        |  FROM frames
        |)
        |SELECT media_id,
        |  cast(count(*) AS BIGINT) AS n_frames,
        |  cast(sum(CASE WHEN prev_fp IS NULL OR frame_fp <> prev_fp
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_scene_changes
        |FROM lagged
        |GROUP BY media_id
        |ORDER BY media_id""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val frames = Tables.documents(s, d)
        .select(col("doc_id").as("media_id"), col("text"),
          explode(sequence(lit(0),
            least(lit(15), greatest(lit(0),
              floor(length(col("text")) / 64).cast("int") - 1)))).as("frame_idx"))
        .select(col("media_id"), col("frame_idx"),
          md5(col("text").substr(col("frame_idx") * 64 + 1, lit(64))
            .cast("binary")).as("frame_fp"))
      val w = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
      frames
        .withColumn("prev_fp", lag(col("frame_fp"), 1).over(w))
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(when(col("prev_fp").isNull
            || col("frame_fp") =!= col("prev_fp"), 1).otherwise(0))
            .cast("long").as("n_scene_changes"))
        .orderBy(col("media_id"))
    },

    // exact binary dedup over opaque payloads: group by content digest,
    // canonical = lowest media id — the media counterpart of t06 (no
    // text normalization: bytes either match or don't). One fp-keyed
    // aggregation + one fp join; payloads never shuffle, digests do.
    sql("u09_media_dedup")(
      """WITH fp AS (
        |  SELECT doc_id AS media_id, md5(text) AS content_fp
        |  FROM documents
        |),
        |grp AS (
        |  SELECT content_fp, min(media_id) AS canonical_id,
        |    cast(count(*) AS BIGINT) AS n_copies
        |  FROM fp GROUP BY content_fp
        |)
        |SELECT media_id, content_fp, canonical_id, n_copies,
        |  cast(media_id <> canonical_id AS INT) AS is_dup
        |FROM fp JOIN grp USING (content_fp)
        |ORDER BY media_id""") { (s, d) =>
      val fp = Tables.documents(s, d)
        .select(col("doc_id").as("media_id"),
          md5(col("text").cast("binary")).as("content_fp"))
      val grp = fp.groupBy(col("content_fp"))
        .agg(min(col("media_id")).as("canonical_id"),
          count(lit(1)).as("n_copies"))
      fp.join(grp, "content_fp")
        .select(col("media_id"), col("content_fp"), col("canonical_id"),
          col("n_copies"),
          (col("media_id") =!= col("canonical_id")).cast("int").as("is_dup"))
        .orderBy(col("media_id"))
    },

    // perceptual-style media near-dup: pairs sharing ≥ 2 frame digests
    // (the frame-fingerprint counterpart of shingle-Jaccard — catches
    // payloads that share aligned byte runs without being byte-equal,
    // e.g. same content with a different tail). The join side is
    // (frame_fp, media_id) — 32-hex keys, never payloads; containment =
    // shared / min(frame count) like t26.
    sql("u10_media_frame_neardup")(
      """WITH frames AS (
        |  SELECT DISTINCT doc_id AS media_id,
        |    md5(substring(text, frame_idx * 128 + 1, 128)) AS frame_fp
        |  FROM (
        |    SELECT doc_id, text,
        |      unnest(generate_series(0,
        |        least(15, greatest(0, length(text) // 128 - 1)))) AS frame_idx
        |    FROM documents) t
        |),
        |cnt AS (SELECT media_id, count(*) AS nf FROM frames GROUP BY media_id),
        |pairs AS (
        |  SELECT a.media_id AS media_a, b.media_id AS media_b,
        |    cast(count(*) AS BIGINT) AS n_shared
        |  FROM frames a JOIN frames b USING (frame_fp)
        |  WHERE a.media_id < b.media_id
        |  GROUP BY a.media_id, b.media_id
        |  HAVING count(*) >= 2
        |)
        |SELECT media_a, media_b, n_shared,
        |  round(n_shared / least(ca.nf, cb.nf)::DOUBLE, 4) AS containment
        |FROM pairs
        |JOIN cnt ca ON ca.media_id = media_a
        |JOIN cnt cb ON cb.media_id = media_b
        |ORDER BY media_a, media_b""") { (s, d) =>
      val frames = Tables.documents(s, d)
        .select(col("doc_id").as("media_id"), col("text"),
          explode(sequence(lit(0),
            least(lit(15), greatest(lit(0),
              floor(length(col("text")) / 128).cast("int") - 1)))).as("frame_idx"))
        .select(col("media_id"),
          md5(col("text").substr(col("frame_idx") * 128 + 1, lit(128))
            .cast("binary")).as("frame_fp"))
        .distinct()
      val cnt = frames.groupBy(col("media_id")).agg(count(lit(1)).as("nf"))
      val a = frames.select(col("media_id").as("media_a"), col("frame_fp"))
      val b = frames.select(col("media_id").as("media_b"), col("frame_fp"))
      a.join(b, "frame_fp")
        .filter(col("media_a") < col("media_b"))
        .groupBy(col("media_a"), col("media_b"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
        .join(cnt.select(col("media_id").as("media_a"), col("nf").as("nf_a")), "media_a")
        .join(cnt.select(col("media_id").as("media_b"), col("nf").as("nf_b")), "media_b")
        .select(col("media_a"), col("media_b"), col("n_shared"),
          round(col("n_shared") / least(col("nf_a"), col("nf_b")).cast("double"), 4)
            .as("containment"))
        .orderBy(col("media_a"), col("media_b"))
    }
  )
}
