package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.DocStore

/** Audits the DataSourceV2 connector on EXECUTED plans: segment skipping
  * off the manifest, exact row-level residual of pushed filters, column
  * pruning down to byte-skipped sections, pruned statistics fed to the
  * optimizer, partial limit pushdown, and null round-tripping through
  * the segment format. The q121 hash gate proves content parity against
  * the original parquet; this spec proves the OPTIMIZATIONS are real. */
class DocStoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val lake = DocStore.ensureLake(spark, dir)
  private def store: DataFrame =
    spark.read.format("graft-docstore").option("path", lake).load()
  private def docs: DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("full scan round-trips every row and column of documents.parquet") {
    val a = store.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = docs.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a.size == 500)
    assert(a == b)
  }

  test("doc_id bounds push into the scan, skip segments, and stay exact") {
    val q = store.where(col("doc_id") >= 100 && col("doc_id") <= 350)
    val plan = physical(q)
    assert(plan.contains("GraftDocStore"), plan)
    val m = "segments=(\\d+)/(\\d+)".r.findFirstMatchIn(plan).get
    assert(m.group(2).toInt == 8, plan)
    assert(m.group(1).toInt < 8, s"bounds must skip segments:\n$plan")
    assert(plan.contains("doc_id=[100,350]"), plan)
    val a = q.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = docs.where(col("doc_id").between(100, 350))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b) // residual applied row-exact, not just per-segment
  }

  test("projection prunes unread sections; count(*) reads no sections") {
    val proj = physical(store.select("lang", "n_chars"))
    val cols = "cols=\\[([^\\]]*)\\]".r.findFirstMatchIn(proj).get.group(1)
    assert(cols.split(",").toSet == Set("lang", "n_chars"), proj)
    assert(!cols.contains("text"), proj)

    val cnt = store.groupBy().count()
    val cntCols = "cols=\\[([^\\]]*)\\]".r
      .findFirstMatchIn(physical(cnt)).get.group(1)
    assert(cntCols.isEmpty, s"count(*) must prune every column:\n${physical(cnt)}")
    assert(cnt.collect()(0).getLong(0) == 500)
  }

  test("optimizer statistics shrink with the pruned segment set") {
    def leaf(df: DataFrame) =
      df.queryExecution.optimizedPlan.collectLeaves().head.stats
    val full = leaf(store)
    val pruned = leaf(store.where(col("doc_id") <= 60))
    assert(pruned.sizeInBytes < full.sizeInBytes,
      s"pruned=${pruned.sizeInBytes} full=${full.sizeInBytes}")
    assert(pruned.rowCount.isDefined && pruned.rowCount.get < 500)
  }

  test("limit pushes down partially and the reader early-stops") {
    val q = store.select("doc_id").limit(7)
    assert(physical(q).contains("limit=7"), physical(q))
    assert(q.collect().length == 7)
  }

  test("nulls and empty strings survive the segment format") {
    val tmp = Files.createTempDirectory("docstore_nulls").toString
    import spark.implicits._
    val df = Seq(
      (0L, Option(10L), Option("pt"), Option("web"), Option("ola")),
      (1L, Option.empty[Long], Option.empty[String], Option.empty[String],
        Option.empty[String]),
      (2L, Option(0L), Option(""), Option("x"), Option("")))
      .toDF("doc_id", "n_chars", "lang", "source", "text")
    df.write.parquet(s"$tmp/documents.parquet")
    val back = spark.read.format("graft-docstore")
      .option("path", DocStore.ensureLake(spark, tmp)).load()
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val expect = df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(back == expect) // null != "" must hold through the round trip
  }
}
