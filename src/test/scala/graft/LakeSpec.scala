package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.Writers

/** The partitioned-lake layout: writes must produce partition directories
  * and a partition-column filter must prune at planning time (the scan
  * reads only the matching directory's files). */
class LakeSpec extends SparkSpec {

  test("date-partitioned write + partition pruning on read") {
    val dir = Files.createTempDirectory("lake").toString
    val events = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("event_date", to_date(col("ts")))
    Writers.partitionedParquet(events, dir, Seq("event_date"))

    val lake = spark.read.parquet(dir)
    val oneDay = lake.filter(col("event_date") === "2024-01-05")

    // planning-time pruning: the filter appears as a PartitionFilter...
    val scan = oneDay.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: ["), scan.take(400))
    assert(scan.contains("event_date"), scan.take(400))
    // ...and at execution only the matching partition's files are touched
    // (inputFiles lists the whole relation pre-pruning, so ask the scan
    // itself which files produced rows)
    val readFiles = oneDay.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    val allFiles = lake.inputFiles.length
    assert(readFiles.length < allFiles,
      s"pruning read ${readFiles.length} of $allFiles files")
    assert(readFiles.forall(_.contains("event_date=2024-01-05")))

    // correctness: pruned count == filter over the unpartitioned source
    val want = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(to_date(col("ts")) === "2024-01-05").count()
    assert(oneDay.count() === want && want > 0)
  }
}
