package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.Multimodal

/** Gate queries for the multimodal plumbing (graft.ext.Multimodal): the
  * metadata/binary path and the frame-sampling path. The decode stage
  * itself is a documented stub (no codec libs in-container) exercised by
  * MultimodalSpec; these queries verify what IS real — binary columns,
  * pruned metadata, byte slicing — against DuckDB.
  *
  * Oracle note: Spark slices the binary content by BYTES, the oracle
  * slices the source string by CHARS then encodes — identical because
  * `documents.text` is ASCII (enforced by the fixture generator).
  */
object MultimodalOps {

  val all: Seq[Q] = Seq(

    Q("q41_multimodal_meta",
      "Media metadata projection over binary content: byte length, " +
        "deterministic format tag (md5-hash pick), 8-byte header hex — " +
        "the metadata a multimodal catalog scan serves without ever " +
        "decoding content.",
      Some("""
        SELECT doc_id AS media_id,
               ['jpeg','png','webp'][(('0x' || substr(md5(text), 1, 7))::BIGINT % 3) + 1] AS format,
               octet_length(encode(text))::BIGINT AS n_bytes,
               upper(hex(encode(substr(text, 1, 8)))) AS header_hex
        FROM documents ORDER BY media_id""")) { (s, dir) =>
      Multimodal.mediaFromDocuments(s, dir)
        .select(col("media_id"), col("format"), col("n_bytes"),
          upper(hex(col("content").substr(lit(1), lit(8)))).as("header_hex"))
        .orderBy("media_id")
    },

    Q("q42_frame_sample",
      "Frame sampling: slice each media blob into 4 contiguous byte " +
        "chunks and explode to one row per frame — per-media frame counts " +
        "and sampled byte totals (the tail remainder past 4 equal frames " +
        "is dropped, like a fixed-stride sampler).",
      Some("""
        WITH m AS (SELECT doc_id, text,
                          greatest(octet_length(encode(text)) // 4, 1) AS fl
                   FROM documents),
        fr AS (SELECT doc_id,
                      unnest(list_transform(range(4),
                        i -> substr(text, (i * fl + 1)::INT, fl::INT))) AS f
               FROM m)
        SELECT doc_id AS media_id,
               COUNT(*) AS n_frames,
               SUM(octet_length(encode(f)))::BIGINT AS frame_bytes
        FROM fr WHERE octet_length(encode(f)) > 0
        GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      Multimodal.sampleFrames(Multimodal.mediaFromDocuments(s, dir), 4)
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(octet_length(col("frame_bytes")).cast("long")).as("frame_bytes"))
        .orderBy("media_id")
    },

    Q("q59_media_resize",
      "The resize stage of the decode/feature/resize/frame-sample " +
        "quartet: byte-stride downsampling (every 4th byte) standing in " +
        "for a pixel resample — native stride expressions, no UDF, " +
        "hash-checked output bytes. The binary->string round trip is " +
        "byte-exact because the fixture content is ASCII (same note as " +
        "q41/q42).",
      Some("""
        WITH m AS (
          SELECT doc_id,
                 ['jpeg','png','webp'][(('0x' || substr(md5(text), 1, 7))::BIGINT % 3) + 1] AS format,
                 text
          FROM documents),
        r AS (SELECT doc_id, format,
                     array_to_string(list_transform(
                       range((octet_length(encode(text)) + 3) // 4),
                       i -> text[(i * 4 + 1)::INT]), '') AS rz
              FROM m)
        SELECT doc_id AS media_id, format,
               octet_length(encode(rz))::BIGINT AS n_bytes,
               sha256(rz) AS content_hash
        FROM r ORDER BY media_id""")) { (s, dir) =>
      Multimodal.resize(Multimodal.mediaFromDocuments(s, dir), 4)
        .select(col("media_id"), col("format"), col("n_bytes"),
          sha2(col("content"), 256).as("content_hash"))
        .orderBy("media_id")
    },

    Q("q43_decode_features",
      "The decode/feature-extract stage itself under the gate: " +
        "Multimodal.extractFeatures (typed mapPartitions, per-partition " +
        "decoder init) runs the deterministic stub codec — a normalized " +
        "16-bin byte histogram — and the gate de-normalizes each float " +
        "bin back to its exact integer count (count <= 2^23, so the " +
        "float32 round-trip c/n*n rounds exactly) and sums per format. " +
        "Oracle: per-byte high-nibble histogram via a lateral range join.",
      Some("""
        WITH m AS (
          SELECT doc_id,
                 ['jpeg','png','webp'][(('0x' || substr(md5(text), 1, 7))::BIGINT % 3) + 1] AS format,
                 text
          FROM documents),
        mi AS (
          SELECT format, text,
                 unnest(range(octet_length(encode(text)))) AS i
          FROM m),
        ch AS (
          SELECT format,
                 ascii(substr(text, (i + 1)::INT, 1)) // 16 AS bin
          FROM mi)
        SELECT format,
               COUNT(CASE WHEN bin = 2 THEN 1 END)::BIGINT AS b02,
               COUNT(CASE WHEN bin = 3 THEN 1 END)::BIGINT AS b03,
               COUNT(CASE WHEN bin = 4 THEN 1 END)::BIGINT AS b04,
               COUNT(CASE WHEN bin = 5 THEN 1 END)::BIGINT AS b05,
               COUNT(CASE WHEN bin = 6 THEN 1 END)::BIGINT AS b06,
               COUNT(CASE WHEN bin = 7 THEN 1 END)::BIGINT AS b07
        FROM ch GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      import s.implicits._
      val media = Multimodal.mediaFromDocuments(s, dir)
      val feats = Multimodal
        .extractFeatures(media.as[Multimodal.MediaRecord]).toDF()
      // feature[i] = count_i / n_bytes; recover the exact count
      val withCounts = feats
        .join(media.select(col("media_id"), col("n_bytes")), Seq("media_id"))
      // ASCII text occupies high-nibble bins 2..7 only; all-zero bins are
      // omitted from the contract (their sums are trivially 0)
      val bins = (2 to 7).map(i =>
        sum(round(element_at(col("feature"), i + 1) * col("n_bytes"))
          .cast("long")).as(f"b$i%02d"))
      withCounts.groupBy(col("format"))
        .agg(bins.head, bins.tail: _*)
        .orderBy("format")
    }
  )
}
