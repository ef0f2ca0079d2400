package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` content plus a
  * typed metadata struct, with decode / feature-extraction / frame-sample
  * stages whose *Spark shape* (schema, partitioning, per-partition batch
  * processing) is real and tested while the actual codec is a
  * deterministic STUB — the image/audio libraries are not in this
  * container, so the stub stands where a JNI/ONNX decoder would plug in.
  *
  * The per-partition iterator pattern below is the JVM analog of
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
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
}
