package graft

import org.apache.spark.sql.functions._
import graft.ext.Multimodal
import graft.ext.Multimodal.MediaRecord

/** The multimodal plumbing that the gate queries can't cover: the typed
  * mapPartitions feature-extraction path (mapInPandas batch shape) and
  * the stub decoder's contract. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def rec(id: Long, s: String) =
    MediaRecord(id, s.getBytes("UTF-8"), "jpeg", s.length.toLong, "src0")

  test("decodeStub: deterministic, 16 bins, normalized") {
    val f1 = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    val f2 = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    assert(f1.toSeq === f2.toSeq)
    assert(f1.length === 16)
    assert(math.abs(f1.sum - 1.0f) < 1e-5)
  }

  test("extractFeatures: schema and per-row features through mapPartitions") {
    val ds = Seq(rec(1, "abc"), rec(2, "zzzz")).toDS()
    val out = Multimodal.extractFeatures(ds).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq === Seq(1L, 2L))
    assert(out(0).feature.toSeq === Multimodal.decodeStub("abc".getBytes("UTF-8")).toSeq)
    // Catalyst sees a typed schema, not an opaque blob
    val schema = Multimodal.extractFeatures(ds).schema
    assert(schema.fieldNames.toSeq === Seq("media_id", "format", "feature"))
  }

  test("sampleFrames: n chunks, remainder dropped, empty frames filtered") {
    val df = Seq((1L, "0123456789")).toDF("media_id", "text")
      .select(col("media_id"), col("text").cast("binary").as("content"))
    val frames = Multimodal.sampleFrames(df, 4).collect()
    // len 10 / 4 → frameLen 2 → frames of 2 bytes, tail "89" dropped
    assert(frames.length === 4)
    assert(frames.map(r => new String(r.getAs[Array[Byte]]("frame_bytes"), "UTF-8")).toSeq
      === Seq("01", "23", "45", "67"))
  }

  test("resize: byte stride, n_bytes from the RESIZED content, empty-safe") {
    val df = Seq((1L, "0123456789"), (2L, "")).toDF("media_id", "text")
      .select(col("media_id"), lit("jpeg").as("format"),
        col("text").cast("binary").as("content"))
    val out = Multimodal.resize(df, 4).collect().sortBy(_.getLong(0))
    assert(new String(out(0).getAs[Array[Byte]]("content"), "UTF-8") === "048")
    assert(out(0).getAs[Long]("n_bytes") === 3) // ceil(10/4), not re-resized
    assert(out(1).getAs[Long]("n_bytes") === 0) // empty content survives
  }

  test("metadata-only scans prune the binary column") {
    val media = Multimodal.mediaFromDocuments(spark, "/root/testdata/sf0.001")
    val plan = media.select("media_id", "format").queryExecution
      .executedPlan.toString
    assert(!plan.contains("content"), s"content not pruned:\n$plan")
  }

  test("real PNG codec: encode→decode round-trips every pixel exactly") {
    val dir = "/root/testdata/sf0.001"
    val one = Multimodal.syntheticPngs(spark, dir)
      .filter(col("media_id") === 7L).collect().head
    // the bytes are a REAL PNG (magic header), not a fake
    assert((one.png(0) & 0xff) == 0x89 &&
      new String(one.png.slice(1, 4), "US-ASCII") == "PNG")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(one.png))
    assert(img.getWidth == Multimodal.ImgSize && img.getHeight == Multimodal.ImgSize)
    for (y <- 0 until Multimodal.ImgSize; x <- 0 until Multimodal.ImgSize) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) == Multimodal.redOf(7L, x, y), s"r($x,$y)")
      assert(((rgb >> 8) & 0xff) == Multimodal.greenOf(7L, x, y), s"g($x,$y)")
      assert((rgb & 0xff) == Multimodal.blueOf(7L, x, y), s"b($x,$y)")
    }
    // resize keeps exactly the strided pixels and is itself decodable
    val small = Multimodal.resizePngs(
      Multimodal.syntheticPngs(spark, dir).filter(col("media_id") === 7L), 2)
      .collect().head
    val simg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(small.png))
    assert(simg.getWidth == 8 && simg.getHeight == 8)
    assert(((simg.getRGB(3, 5) >> 16) & 0xff) == Multimodal.redOf(7L, 6, 10))
  }

  test("real WAV codec: RIFF framing parses back to the exact samples") {
    val one = Multimodal.syntheticWavs(spark, "/root/testdata/sf0.001")
      .filter(col("media_id") === 7L).collect().head
    assert(new String(one.wav.take(4), "US-ASCII") == "RIFF")
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(one.wav))
    val samples = in.readAllBytes()
    in.close()
    assert(samples.length == Multimodal.WavSamples)
    samples.zipWithIndex.foreach { case (b, i) =>
      assert((b & 0xff) == Multimodal.sampleOf(7L, i), s"sample $i")
    }
  }
}
