package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` content plus a
  * typed metadata struct, with decode / feature-extraction / resize /
  * frame-sample stages.
  *
  * Two tiers:
  *  - **REAL codecs** (bottom half of this file): PNG via the JDK's own
  *    javax.imageio and WAV via javax.sound.sampled — genuine
  *    encode → decode → resample round trips on executor partitions, no
  *    external library needed, oracle-checked exactly because the
  *    synthesized media is a closed form and the codecs are lossless.
  *  - **Stub tier** (top half): the byte-histogram "decode" stands where
  *    a MODEL would plug in (CLIP-style embeddings, an ONNX runtime) —
  *    that genuinely isn't in this container, so the stub keeps the
  *    Spark shape (schema, batching) real while the numbers are fake.
  *
  * The per-partition iterator pattern throughout is the JVM analog of
  * `mapInPandas`: one initialization per partition (where a real pipeline
  * loads its model/codec once), then a streamed pass over rows — never a
  * per-row library call, never a collect.
  */
object Multimodal {

  /** Typed media row: id + opaque bytes + metadata the planner can prune. */
  final case class MediaRecord(
      media_id: Long,
      content: Array[Byte],
      format: String,
      n_bytes: Long,
      source: String)

  final case class MediaFeatures(
      media_id: Long,
      format: String,
      feature: Array[Float])

  private val Formats = Seq("jpeg", "png", "webp")

  /** Derive a media table from `documents` (the driver lake carries no
    * real binaries): content = UTF-8 bytes, format = deterministic hash
    * pick. Column pruning still works — a query touching only metadata
    * never deserializes `content`. */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.core.Tables.documents(spark, dir)
    val fmtIdx = conv(substring(md5(col("text")), 1, 7), 16, 10)
      .cast("long") % Formats.length
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("content"),
      element_at(array(Formats.map(lit): _*), (fmtIdx + 1).cast("int")).as("format"),
      octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
      col("source"))
  }

  /** STUB decoder — deterministic fake standing in for a real image/audio
    * decode (no codec libs in this container). Produces a 16-bin
    * normalized byte histogram; a real implementation would return model
    * embeddings or decoded-pixel features with exactly this signature. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1f; i += 1 }
    val n = math.max(bytes.length, 1).toFloat
    hist.map(_ / n)
  }

  /** Feature extraction with mapInPandas batch shape: per-partition init
    * (the `decoder` val is where a model handle would load), streamed rows,
    * typed output schema. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder: Array[Byte] => Array[Float] = decodeStub // per-partition init
      rows.map(r => MediaFeatures(r.media_id, r.format, decoder(r.content)))
    }
  }

  /** Resize: keep every `factor`-th byte of the content — the
    * deterministic stand-in for an image/audio downsample (no codec libs
    * in-container; a real implementation swaps the byte-stride for a
    * pixel resample with the same signature). Pure native expressions —
    * stride indices via sequence/transform, no UDF — so the projection
    * stays inside codegen and the operator is a per-row map at any
    * scale. */
  def resize(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val len = octet_length(col("content"))
    // sequence(0, -1) would step DOWNWARDS, not produce empty — guard 0-len
    val resized = when(len > 0, concat_ws("",
      transform(sequence(lit(0), ceil(len.cast("double") / factor).cast("long") - 1),
        i => col("content").cast("string")
          .substr((i * factor + 1).cast("int"), lit(1)))))
      .otherwise(lit(""))
    // bind once: aliasing the output "content" in the same select would
    // make the n_bytes expression's col("content") resolve to the NEW
    // alias (lateral column alias), double-applying the stride
    media.withColumn("_resized", resized.cast("binary"))
      .select(col("media_id"), col("format"),
        col("_resized").as("content"),
        octet_length(col("_resized")).cast("long").as("n_bytes"))
  }

  /** Frame sampling: split content into `n` contiguous byte chunks
    * ("frames") and explode — pure native expressions, one row per frame,
    * no UDF. A video pipeline would swap the slicer for a keyframe
    * decoder with the same (media_id, frame_idx, frame_bytes) shape. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val len = octet_length(col("content"))
    val frameLen = greatest((len / n).cast("int"), lit(1))
    media.select(col("media_id"),
      posexplode(transform(sequence(lit(0), lit(n - 1)), i =>
        col("content").substr(i * frameLen + 1, frameLen)))
        .as(Seq("frame_idx", "frame_bytes")))
      .filter(octet_length(col("frame_bytes")) > 0)
  }

  // ====================================================================
  // REAL codecs — the JDK ships PNG (javax.imageio) and WAV
  // (javax.sound.sampled) encode/decode, so this half of the multimodal
  // story needs no external library at all. The trick that makes it
  // ORACLE-CHECKABLE: media is SYNTHESIZED deterministically — pixel
  // (x, y) of image d is a closed-form function of (d, x, y), and
  // sample i of clip d likewise — then pushed through the REAL
  // encode → decode round trip. PNG and WAV are lossless, so features
  // computed from DECODED pixels/samples must equal the closed form,
  // which DuckDB replays exactly with generate_series arithmetic. A
  // wrong decode (channel order, row stride, sample signedness) breaks
  // the hash gate immediately.
  // ====================================================================

  val ImgSize = 16 // 16×16 RGB
  val WavSamples = 64 // 8-bit unsigned PCM, mono

  /** Closed-form channel values — mirrored in the oracle SQL. */
  def redOf(d: Long, x: Int, y: Int): Int = ((d * 31 + x * 7 + y * 13) % 256).toInt
  def greenOf(d: Long, x: Int, y: Int): Int = ((d * 17 + x * 11 + y * 3) % 256).toInt
  def blueOf(d: Long, x: Int, y: Int): Int = ((d * 29 + x * 5 + y * 19) % 256).toInt
  def sampleOf(d: Long, i: Int): Int = ((d * 7 + i * 11) % 256).toInt

  final case class Png(media_id: Long, png: Array[Byte])
  final case class ImageFeatures(media_id: Long, width: Int, height: Int,
      r_sum: Long, g_sum: Long, b_sum: Long)
  final case class Wav(media_id: Long, wav: Array[Byte])
  final case class AudioFeatures(media_id: Long, n_samples: Long,
      sum_amp: Long, peak: Int)

  private def ensureHeadless(): Unit =
    System.setProperty("java.awt.headless", "true")

  /** One real PNG per document id: executor-side ImageIO ENCODE in a
    * per-partition loop (the mapInPandas batch shape — codec state per
    * partition, streamed rows, never a collect). */
  def syntheticPngs(spark: SparkSession, dir: String): Dataset[Png] = {
    import spark.implicits._
    graft.core.Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ensureHeadless()
        ids.map { d =>
          val img = new java.awt.image.BufferedImage(
            ImgSize, ImgSize, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < ImgSize) {
            var x = 0
            while (x < ImgSize) {
              img.setRGB(x, y, (redOf(d, x, y) << 16) |
                (greenOf(d, x, y) << 8) | blueOf(d, x, y))
              x += 1
            }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          Png(d, out.toByteArray)
        }
      }
  }

  /** Real ImageIO DECODE → per-channel integer sums (exact,
    * order-independent — the cross-engine-deterministic feature the
    * oracle can replay; a float embedding would hash-drift). */
  def decodePngFeatures(pngs: Dataset[Png]): Dataset[ImageFeatures] = {
    import pngs.sparkSession.implicits._
    pngs.mapPartitions { rows =>
      ensureHeadless()
      rows.map { p =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(p.png))
        var (r, g, b) = (0L, 0L, 0L)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            r += (rgb >> 16) & 0xff; g += (rgb >> 8) & 0xff; b += rgb & 0xff
            x += 1
          }
          y += 1
        }
        ImageFeatures(p.media_id, img.getWidth, img.getHeight, r, g, b)
      }
    }
  }

  /** Real image resize: decode → nearest-neighbor resample (stride
    * `factor`, bit-deterministic — Graphics2D interpolation would vary
    * with rendering hints) → RE-ENCODE to PNG. The output is again a
    * real image column downstream stages can decode. */
  def resizePngs(pngs: Dataset[Png], factor: Int): Dataset[Png] = {
    import pngs.sparkSession.implicits._
    require(factor >= 1)
    pngs.mapPartitions { rows =>
      ensureHeadless()
      rows.map { p =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(p.png))
        val (w, h) = (img.getWidth / factor, img.getHeight / factor)
        val small = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            small.setRGB(x, y, img.getRGB(x * factor, y * factor))
            x += 1
          }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(small, "png", out)
        Png(p.media_id, out.toByteArray)
      }
    }
  }

  /** One real WAV per document id (javax.sound ENCODE: 8 kHz mono 8-bit
    * unsigned PCM — the JDK's own writer emits the RIFF framing). */
  def syntheticWavs(spark: SparkSession, dir: String): Dataset[Wav] = {
    import spark.implicits._
    graft.core.Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        // constructed INSIDE the partition: AudioFormat is not
        // serializable, so a captured one fails task ship
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1,
          false, false)
        ids.map { d =>
          val samples = Array.tabulate(WavSamples)(i => sampleOf(d, i).toByte)
          val out = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(samples), fmt,
              WavSamples.toLong),
            javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
          Wav(d, out.toByteArray)
        }
      }
  }

  /** Real javax.sound DECODE: parse the RIFF container back to PCM
    * frames and reduce to exact integer features. */
  def decodeWavFeatures(wavs: Dataset[Wav]): Dataset[AudioFeatures] = {
    import wavs.sparkSession.implicits._
    wavs.mapPartitions { rows =>
      rows.map { w =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(w.wav))
        val bytes = in.readAllBytes()
        in.close()
        var (sum, peak) = (0L, 0)
        bytes.foreach { b =>
          val v = b & 0xff
          sum += v
          if (v > peak) peak = v
        }
        AudioFeatures(w.media_id, bytes.length.toLong, sum, peak)
      }
    }
  }
}
