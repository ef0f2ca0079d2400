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
}
