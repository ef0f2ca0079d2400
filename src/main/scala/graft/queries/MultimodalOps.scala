package graft.queries

import org.apache.spark.sql.functions._
import graft.ext.Multimodal

/** Gate queries for the multimodal plumbing (graft.ext.Multimodal), in
  * two tiers matching the ext module: q41–q43/q59 exercise the binary
  * columns / pruned metadata / byte slicing around the model-feature
  * STUB (a learned model genuinely isn't in-container), while
  * q138–q140 run REAL JDK codecs — ImageIO PNG encode→decode→resample
  * and javax.sound WAV framing — oracle-exact because the synthesized
  * media is closed-form and the codecs are lossless.
  *
  * Oracle note for the byte-slicing gates: Spark slices the binary
  * content by BYTES, the oracle slices the source string by CHARS then
  * encodes — identical because `documents.text` is ASCII (enforced by
  * the fixture generator).
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
    },

    // ------------------------------------ REAL image codec (JDK ImageIO)
    Q("q138_image_decode",
      "A REAL image decode, not a stub: one 16×16 RGB PNG per document " +
        "is synthesized on executors (pixel (x,y) of image d is a " +
        "closed-form function of (d,x,y)), ENCODED with the JDK's own " +
        "javax.imageio PNG writer, then DECODED back and reduced to " +
        "exact per-channel integer sums. PNG is lossless, so the " +
        "decoded sums must equal the closed form — which the oracle " +
        "replays with generate_series arithmetic; a channel-order, " +
        "row-stride, or signedness mistake in the decode breaks the " +
        "hash immediately. Per-partition codec init, streamed rows " +
        "(the mapInPandas batch shape), zero external libraries.",
      Some("""
        WITH px AS (
          SELECT gx.x, gy.y
          FROM generate_series(0, 15) AS gx(x)
          CROSS JOIN generate_series(0, 15) AS gy(y)),
        img AS (
          SELECT d.doc_id,
                 SUM((d.doc_id*31 + px.x*7  + px.y*13) % 256) AS r_sum,
                 SUM((d.doc_id*17 + px.x*11 + px.y*3)  % 256) AS g_sum,
                 SUM((d.doc_id*29 + px.x*5  + px.y*19) % 256) AS b_sum
          FROM documents d CROSS JOIN px GROUP BY 1)
        SELECT doc_id % 10 AS grp,
               COUNT(*) AS n_imgs,
               (COUNT(*) * 16)::BIGINT AS w_total,
               SUM(r_sum)::BIGINT AS r_total,
               SUM(g_sum)::BIGINT AS g_total,
               SUM(b_sum)::BIGINT AS b_total
        FROM img GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      Multimodal.decodePngFeatures(Multimodal.syntheticPngs(s, dir)).toDF()
        .groupBy((col("media_id") % 10).as("grp"))
        .agg(count(lit(1)).as("n_imgs"),
          sum(col("width")).as("w_total"),
          sum(col("r_sum")).as("r_total"),
          sum(col("g_sum")).as("g_total"),
          sum(col("b_sum")).as("b_total"))
        .orderBy("grp")
    },

    // --------------------------- REAL image resize (decode → NN → re-encode)
    Q("q139_image_resize",
      "A REAL image resize: decode the PNG, nearest-neighbor resample " +
        "16×16 → 8×8 (stride 2 — bit-deterministic, unlike Graphics2D " +
        "interpolation), RE-ENCODE to PNG, then decode the RESIZED " +
        "image and sum channels. The oracle replays the resample as " +
        "the closed form at even coordinates — proof the output is a " +
        "decodable image whose pixels are exactly the strided " +
        "originals, i.e. the full decode→transform→encode loop a " +
        "vision-training preprocessor runs per batch.",
      Some("""
        WITH px AS (
          SELECT gx.x, gy.y
          FROM generate_series(0, 7) AS gx(x)
          CROSS JOIN generate_series(0, 7) AS gy(y)),
        img AS (
          SELECT d.doc_id,
                 SUM((d.doc_id*31 + (px.x*2)*7  + (px.y*2)*13) % 256) AS r_sum,
                 SUM((d.doc_id*17 + (px.x*2)*11 + (px.y*2)*3)  % 256) AS g_sum,
                 SUM((d.doc_id*29 + (px.x*2)*5  + (px.y*2)*19) % 256) AS b_sum
          FROM documents d CROSS JOIN px GROUP BY 1)
        SELECT doc_id % 10 AS grp,
               COUNT(*) AS n_imgs,
               (COUNT(*) * 8)::BIGINT AS w_total,
               SUM(r_sum)::BIGINT AS r_total,
               SUM(g_sum)::BIGINT AS g_total,
               SUM(b_sum)::BIGINT AS b_total
        FROM img GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      Multimodal.decodePngFeatures(
        Multimodal.resizePngs(Multimodal.syntheticPngs(s, dir), 2)).toDF()
        .groupBy((col("media_id") % 10).as("grp"))
        .agg(count(lit(1)).as("n_imgs"),
          sum(col("width")).as("w_total"),
          sum(col("r_sum")).as("r_total"),
          sum(col("g_sum")).as("g_total"),
          sum(col("b_sum")).as("b_total"))
        .orderBy("grp")
    },

    // ----------------------------- REAL audio codec (javax.sound WAV)
    Q("q140_audio_decode",
      "A REAL audio decode: one 64-sample 8-bit unsigned PCM mono clip " +
        "per document, written into RIFF/WAVE framing by the JDK's own " +
        "javax.sound writer, parsed back through " +
        "AudioSystem.getAudioInputStream, and reduced to exact integer " +
        "amplitude features. The WAV container is lossless PCM, so " +
        "decoded sums equal the closed-form samples the oracle " +
        "replays — a header-offset or signedness mistake in the decode " +
        "shifts every sum. Audio twin of q138.",
      Some("""
        WITH s AS (SELECT gi.i FROM generate_series(0, 63) AS gi(i)),
        clip AS (
          SELECT d.doc_id,
                 SUM((d.doc_id*7 + s.i*11) % 256) AS sum_amp,
                 MAX((d.doc_id*7 + s.i*11) % 256) AS peak
          FROM documents d CROSS JOIN s GROUP BY 1)
        SELECT doc_id % 10 AS grp,
               COUNT(*) AS n_clips,
               (COUNT(*) * 64)::BIGINT AS samples_total,
               SUM(sum_amp)::BIGINT AS amp_total,
               MAX(peak) AS max_peak
        FROM clip GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      Multimodal.decodeWavFeatures(Multimodal.syntheticWavs(s, dir)).toDF()
        .groupBy((col("media_id") % 10).as("grp"))
        .agg(count(lit(1)).as("n_clips"),
          sum(col("n_samples")).as("samples_total"),
          sum(col("sum_amp")).as("amp_total"),
          max(col("peak")).cast("long").as("max_peak"))
        .orderBy("grp")
    }
  )
}
