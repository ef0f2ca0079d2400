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

    // a FILTERED count defeats aggregate pushdown (bounds make the
    // manifest inexact) and must hit the header-only reading path:
    // every column pruned, doc_id section read only for the residual
    val cnt = store.where(col("doc_id") <= 60).groupBy().count()
    val cntCols = "cols=\\[([^\\]]*)\\]".r
      .findFirstMatchIn(physical(cnt)).get.group(1)
    assert(cntCols.isEmpty, s"count must prune every column:\n${physical(cnt)}")
    assert(cnt.collect()(0).getLong(0) == 61)
  }

  test("unfiltered COUNT/MIN/MAX answer from the manifest with zero segment IO") {
    val agg = store.groupBy()
      .agg(count(lit(1)), min("doc_id"), max("doc_id"))
    val plan = physical(agg)
    assert(plan.contains("manifest-only"), plan)
    assert(!plan.contains("segments="), s"no segment may be planned:\n$plan")
    assert(agg.collect()(0).toSeq == Seq(500L, 0L, 499L))
    // exactness guard: a filtered aggregate must FALL BACK to reading
    val filtered = store.where(col("doc_id") <= 60)
      .groupBy().agg(min("doc_id"), max("doc_id"))
    assert(physical(filtered).contains("segments="), physical(filtered))
    assert(filtered.collect()(0).toSeq == Seq(0L, 60L))
    // non-doc_id aggregates must also fall back, not mis-push
    val other = store.groupBy().agg(sum("n_chars"))
    assert(physical(other).contains("segments="), physical(other))
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

  test("streaming read advances in bounded micro-batches to the batch result") {
    lake // force build
    spark.catalog.dropTempView("docstore_stream_test")
    val q = spark.readStream.format("graft-docstore")
      .option("path", lake).option("maxSegmentsPerBatch", "2").load()
      .groupBy("lang").count()
      .writeStream.format("memory").queryName("docstore_stream_test")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    // 8 segments / 2 per batch → at least 4 data micro-batches ran
    assert(q.recentProgress.count(_.numInputRows > 0) >= 4,
      q.recentProgress.map(p => s"${p.batchId}:${p.numInputRows}").mkString(","))
    val streamed = spark.table("docstore_stream_test")
      .orderBy("lang").collect().map(_.toSeq).toSeq
    val batch = docs.groupBy("lang").count()
      .orderBy("lang").collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }

  test("checkpointed stop/restart resumes from the committed offset without re-reads") {
    lake
    val out = Files.createTempDirectory("docstore_restart_out").toString
    val ckpt = Files.createTempDirectory("docstore_restart_ckpt").toString
    def src = spark.readStream.format("graft-docstore")
      .option("path", lake).option("maxSegmentsPerBatch", "2").load()
      .select("doc_id")
    // leg 1: exactly one micro-batch (2 of 8 segments), then stop
    val q1 = src.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.Once()).start()
    q1.awaitTermination()
    val afterLeg1 = spark.read.parquet(out).count()
    assert(afterLeg1 > 0 && afterLeg1 < 500, s"leg 1 read $afterLeg1 rows")
    // leg 2: same checkpoint → drains the remaining segments only
    val q2 = src.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    try q2.processAllAvailable() finally q2.stop()
    val ids = spark.read.parquet(out)
    assert(ids.count() == 500, "restart must not duplicate or drop segments")
    assert(ids.distinct().count() == 500)
  }

  test("runtime filtering prunes segments from a join's build-side keys") {
    lake // force build
    // dimension = a FILTERED scan confined to the lowest doc_id range —
    // DPP requires a selective predicate on the build side (a bare
    // local relation does not qualify); dynamic pruning should then cut
    // the probe scan to the segment(s) spanning the surviving keys
    def dim = docs.select(col("doc_id").as("dim_id"))
      .where(col("dim_id").isin(5L, 17L, 23L))
    graft.sources.DocStoreScan.lastRuntimePlanned = -1
    val joined = store.join(broadcast(dim), col("doc_id") === col("dim_id"))
      .agg(count(lit(1)), sum("n_chars"))
    val row = joined.collect()(0)
    assert(row.getLong(0) == 3)
    val planned = graft.sources.DocStoreScan.lastRuntimePlanned
    assert(planned >= 1 && planned < 8,
      s"expected runtime segment pruning to fire and keep <8 segments, planned=$planned " +
        s"(-1 means filter() was never called)\n" +
        joined.queryExecution.executedPlan.toString)
    // correctness unaffected: same result as the parquet-side join
    val expect = docs.join(dim, col("doc_id") === col("dim_id"))
      .agg(count(lit(1)), sum("n_chars")).collect()(0)
    assert(row.toSeq == expect.toSeq)
  }

  test("DSv2 write: overwrite replaces content and drops old segments; append accumulates") {
    val tmp = Files.createTempDirectory("docstore_write").toString
    def slice(a: Long, b: Long) = docs.where(col("doc_id").between(a, b))
    def readBack = spark.read.format("graft-docstore")
      .option("path", tmp).load()

    slice(0, 99).write.format("graft-docstore").mode("overwrite")
      .option("path", tmp).save()
    assert(readBack.count() == 100)

    // append: new segments extend the manifest, nothing replaced
    slice(100, 149).write.format("graft-docstore").mode("append")
      .option("path", tmp).save()
    assert(readBack.count() == 150)
    assert(readBack.select("doc_id").distinct().count() == 150)

    // overwrite: truncate-and-replace — content AND files
    slice(200, 219).write.format("graft-docstore").mode("overwrite")
      .option("path", tmp).save()
    assert(readBack.orderBy("doc_id").collect().map(_.getLong(0)).toSeq ==
      (200L to 219L))
    val names = {
      import scala.jdk.CollectionConverters._
      val st = Files.list(java.nio.file.Paths.get(tmp))
      try st.iterator().asScala.map(_.getFileName.toString).toVector
      finally st.close()
    }
    val manifest = graft.sources.DocStore.readManifest(tmp).map(_.name).toSet
    assert(names.filter(_.endsWith(".gds")).toSet == manifest,
      s"files on disk $names must be exactly the manifest $manifest")
    assert(!names.exists(_.startsWith(".stg-")), s"staging left behind: $names")
  }

  test("DSv2 write resolves columns by name and rejects bad inputs") {
    val tmp = Files.createTempDirectory("docstore_write_cols").toString
    // permuted column order must land correctly
    docs.where(col("doc_id") < 10)
      .select("text", "lang", "doc_id", "n_chars", "source")
      .write.format("graft-docstore").mode("overwrite")
      .option("path", tmp).save()
    val back = spark.read.format("graft-docstore").option("path", tmp).load()
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val expect = docs.where(col("doc_id") < 10)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(back == expect)

    // missing NULLABLE columns are null-padded by Spark's by-name
    // output resolution (standard table-write semantics) …
    val tmp2 = Files.createTempDirectory("docstore_write_pad").toString
    docs.select("doc_id", "lang").where(col("doc_id") < 3)
      .write.format("graft-docstore").mode("overwrite")
      .option("path", tmp2).save()
    val padded = spark.read.format("graft-docstore").option("path", tmp2)
      .load().orderBy("doc_id").collect()
    assert(padded.length == 3 && padded.forall(r =>
      !r.isNullAt(0) && !r.isNullAt(2) && r.isNullAt(1) && r.isNullAt(4)))
    // … but the non-nullable doc_id cannot be omitted
    intercept[Exception] {
      docs.select("lang", "text").write.format("graft-docstore")
        .mode("overwrite").option("path", tmp2).save()
    }
    // and an unknown extra column is rejected
    intercept[Exception] {
      docs.withColumn("extra", lit(1)).write.format("graft-docstore")
        .mode("overwrite").option("path", tmp2).save()
    }
    // null doc_id → task failure, job aborts, manifest unchanged
    import spark.implicits._
    intercept[Exception] {
      Seq((Option.empty[Long], Option(1L), Option("x"), Option("y"), Option("z")))
        .toDF("doc_id", "n_chars", "lang", "source", "text")
        .write.format("graft-docstore").mode("append")
        .option("path", tmp).save()
    }
    assert(spark.read.format("graft-docstore").option("path", tmp).load()
      .count() == 10, "failed write must not change the table")
  }

  test("streaming sink: multi-epoch append and idempotent epoch replay") {
    lake
    val base = Files.createTempDirectory("docstore_sink_spec")
    val sink = base.resolve("t").toString
    val ckpt = base.resolve("c").toString
    val q = spark.readStream.format("graft-docstore")
      .option("path", lake).option("maxSegmentsPerBatch", "2").load()
      .writeStream.format("graft-docstore")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val manifest = graft.sources.DocStore.readManifest(sink)
    // 8 source segments / 2 per batch → segments from ≥4 distinct epochs,
    // each marker carrying the writing query's id
    val marks = manifest.map(_.name).flatMap(
      "part-q([0-9a-f]+)-e(\\d+)-".r.findFirstMatchIn(_))
    val epochs = marks.map(_.group(2).toInt).distinct
    assert(epochs.size >= 4, s"expected ≥4 epochs, manifest: ${manifest.map(_.name)}")
    val sunk = spark.read.format("graft-docstore").option("path", sink).load()
    assert(sunk.count() == 500)
    assert(sunk.select("doc_id").distinct().count() == 500)

    // replay an already-committed epoch OF THE SAME QUERY directly (the
    // crash-between-commit-and-checkpoint case): must skip, not duplicate
    val qid = marks.head.group(1)
    val epoch = epochs.head.toLong
    val stg = java.nio.file.Paths.get(sink, ".stg-replay-test")
    val enc = new graft.sources.DocStore.SegmentEncoder
    enc.add(9999L, 1L, "xx".getBytes, "replay".getBytes, "dup".getBytes)
    val bytes = enc.writeTo(stg)
    new graft.sources.DocStoreStreamingWrite(sink, DocStore.SCHEMA,
      Array(0, 1, 2, 3, 4), qid, truncate = false)
      .commit(epoch, Array(graft.sources.DocStoreCommit(
        ".stg-replay-test", 1L, 9999L, 9999L, bytes)))
    assert(spark.read.format("graft-docstore").option("path", sink).load()
      .count() == 500, "replayed epoch must not re-apply")
    assert(!Files.exists(stg), "replayed epoch's staging must be cleaned up")

    // a DIFFERENT query appending to the same table re-numbers its epochs
    // from 0 — its batches must LAND, not be mistaken for replays
    val ckpt2 = base.resolve("c2").toString
    val q2 = spark.readStream.format("graft-docstore")
      .option("path", lake).option("maxSegmentsPerBatch", "4").load()
      .writeStream.format("graft-docstore")
      .option("path", sink).option("checkpointLocation", ckpt2)
      .outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.format("graft-docstore").option("path", sink).load()
      .count() == 1000,
      "a second query's epoch 0 must not be dropped as a replay")
  }

  test("in-place compaction shrinks the segment count and restores range locality") {
    val tmp = Files.createTempDirectory("docstore_opt").toString
    Seq(0, 1, 2).foreach { r =>
      docs.where(col("doc_id") % 3 === r).repartition(4)
        .write.format("graft-docstore").mode("append")
        .option("path", tmp).save()
    }
    val before = graft.sources.DocStore.readManifest(tmp)
    assert(before.size == 12, s"expected 12 fragments, got ${before.map(_.name)}")
    // fragmented layout: every segment spans nearly the whole id range
    assert(before.forall(s => s.maxId - s.minId > 400))

    spark.read.format("graft-docstore").option("path", tmp).load()
      .repartitionByRange(2, col("doc_id"))
      .write.format("graft-docstore").mode("overwrite")
      .option("path", tmp).save()

    val after = graft.sources.DocStore.readManifest(tmp)
    assert(after.size == 2, s"expected 2 compacted segments: ${after.map(_.name)}")
    val sorted = after.sortBy(_.minId)
    assert(sorted(0).maxId < sorted(1).minId,
      s"compacted segments must not overlap: $sorted")
    val back = spark.read.format("graft-docstore").option("path", tmp).load()
    assert(back.count() == 500 && back.select("doc_id").distinct().count() == 500)
  }

  test("strict bounds at the Long extremes stay exact, never wrap") {
    lake
    assert(store.where(col("doc_id") > Long.MaxValue).count() == 0)
    assert(store.where(col("doc_id") < Long.MinValue).count() == 0)
    // the empty window must also decline the metadata-only aggregate
    val agg = store.where(col("doc_id") > Long.MaxValue)
      .groupBy().agg(count(lit(1)), min("doc_id"))
    assert(!physical(agg).contains("manifest-only"), physical(agg))
    val r = agg.collect()(0)
    assert(r.getLong(0) == 0 && r.isNullAt(1))
  }

  test("catalog: lifecycle SQL works; misaligned DELETE refuses instead of approximating") {
    val root = Files.createTempDirectory("docstore_cat_spec").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.tcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.tcat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .createOrReplaceTempView("cat_src")
    sc.sql("CREATE NAMESPACE tcat.ns1")
    sc.sql("CREATE TABLE tcat.ns1.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING)")
    sc.sql("INSERT INTO tcat.ns1.t SELECT * FROM cat_src WHERE doc_id < 100")
    sc.sql("INSERT INTO tcat.ns1.t SELECT * FROM cat_src WHERE doc_id BETWEEN 100 AND 199")
    assert(sc.sql("SELECT COUNT(*) FROM tcat.ns1.t").collect()(0).getLong(0) == 200)
    assert(sc.sql("SHOW TABLES IN tcat.ns1").collect().map(_.getString(1)).toSeq == Seq("t"))

    // aligned delete: metadata-only, rows gone, files gone
    sc.sql("DELETE FROM tcat.ns1.t WHERE doc_id >= 100")
    assert(sc.sql("SELECT COUNT(*), MAX(doc_id) FROM tcat.ns1.t")
      .collect()(0).toSeq == Seq(100L, 99L))

    // misaligned delete (cuts through a segment) falls back to the
    // copy-on-write row-level path: exact rows gone, none approximated
    sc.sql("DELETE FROM tcat.ns1.t WHERE doc_id >= 50")
    assert(sc.sql("SELECT COUNT(*), MAX(doc_id) FROM tcat.ns1.t")
      .collect()(0).toSeq == Seq(50L, 49L))

    sc.sql("ALTER TABLE tcat.ns1.t RENAME TO ns1.t2")
    assert(sc.sql("SELECT COUNT(*) FROM tcat.ns1.t2").collect()(0).getLong(0) == 50)
    // SQL TRUNCATE: content gone, table (and its schema) remains
    val preTruncFloor =
      graft.sources.DocStoreCommitOps.nextPartNumber(s"$root/ns1/t2")
    sc.sql("TRUNCATE TABLE tcat.ns1.t2")
    assert(sc.sql("SELECT COUNT(*) FROM tcat.ns1.t2").collect()(0).getLong(0) == 0)
    sc.sql("INSERT INTO tcat.ns1.t2 SELECT * FROM cat_src WHERE doc_id < 10")
    assert(sc.sql("SELECT COUNT(*) FROM tcat.ns1.t2").collect()(0).getLong(0) == 10)
    // r8 advice: truncate persists a numbering floor, so the post-wipe
    // INSERT must NOT recreate a low part number a streaming reader may
    // have checkpointed (names are the resume keys — a reused name with
    // different contents would be silently skipped on restart)
    val postTruncNames =
      graft.sources.DocStore.readManifest(s"$root/ns1/t2").map(_.name)
    assert(postTruncNames.nonEmpty && postTruncNames.forall { n =>
      "^part-(\\d+)\\.gds$".r.findFirstMatchIn(n)
        .forall(_.group(1).toInt >= preTruncFloor)
    }, s"post-truncate names must start at floor $preTruncFloor: $postTruncNames")
    sc.sql("DROP TABLE tcat.ns1.t2")
    assert(sc.sql("SHOW TABLES IN tcat.ns1").collect().isEmpty)
  }

  test("row-level UPDATE/MERGE/misaligned-DELETE rewrite only the affected segments") {
    val root = Files.createTempDirectory("docstore_rowlevel").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.rcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.rcat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .coalesce(1).createOrReplaceTempView("rl_src")
    sc.sql("CREATE NAMESPACE rcat.ns")
    sc.sql("CREATE TABLE rcat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING)")
    // 4 single-segment inserts: doc_id slices [0,99] [100,199] [200,299] [300,399]
    (0 until 4).foreach(i => sc.sql("INSERT INTO rcat.ns.t " +
      s"SELECT * FROM rl_src WHERE doc_id BETWEEN ${i * 100} AND ${i * 100 + 99}"))
    val tableDir = java.nio.file.Paths.get(root, "ns", "t").toString
    def names = DocStore.readManifest(tableDir).map(_.name)
    val before = names

    // UPDATE confined to one slice: copy-on-write must replace ONLY the
    // segment(s) intersecting the window — the other three are metadata
    sc.sql("UPDATE rcat.ns.t SET lang = 'xx' WHERE doc_id BETWEEN 100 AND 149")
    val afterUpdate = names
    assert(sc.sql("SELECT COUNT(*) FROM rcat.ns.t WHERE lang = 'xx'")
      .collect()(0).getLong(0) == 50)
    assert(sc.sql("SELECT COUNT(*) FROM rcat.ns.t").collect()(0).getLong(0) == 400,
      "unmatched rows of the rewritten segment must be copied through")
    val untouched = before.filterNot(n =>
      DocStore.readManifest(tableDir, "MANIFEST.v4").find(_.name == n)
        .exists(s => s.maxId >= 100 && s.minId <= 149))
    assert(untouched.size == 3 && untouched.forall(afterUpdate.contains),
      s"segments outside the window must survive by name: $before -> $afterUpdate")
    assert(afterUpdate.exists(n => !before.contains(n)), "a rewritten segment appears")
    // pre-UPDATE snapshot still reads the original values (files retained)
    assert(sc.sql("SELECT COUNT(*) FROM rcat.ns.t VERSION AS OF 4 WHERE lang = 'xx'")
      .collect()(0).getLong(0) == 0)

    // MERGE: update n_chars for one slice, insert brand-new doc_ids
    sc.sql("SELECT doc_id, n_chars * 10 AS n_chars, lang, source, text " +
      "FROM rl_src WHERE doc_id BETWEEN 200 AND 249 " +
      "UNION ALL SELECT doc_id + 1000, n_chars, lang, source, text " +
      "FROM rl_src WHERE doc_id BETWEEN 0 AND 9")
      .createOrReplaceTempView("rl_merge_src")
    sc.sql("""MERGE INTO rcat.ns.t t USING rl_merge_src s ON t.doc_id = s.doc_id
              WHEN MATCHED THEN UPDATE SET n_chars = s.n_chars
              WHEN NOT MATCHED THEN INSERT *""")
    assert(sc.sql("SELECT COUNT(*) FROM rcat.ns.t").collect()(0).getLong(0) == 410)
    val merged = sc.sql("SELECT SUM(n_chars) FROM rcat.ns.t WHERE doc_id BETWEEN 200 AND 249")
      .collect()(0).getLong(0)
    val original = sc.sql("SELECT SUM(n_chars) * 10 FROM rl_src WHERE doc_id BETWEEN 200 AND 249")
      .collect()(0).getLong(0)
    assert(merged == original, "matched rows must carry the merged n_chars")

    // misaligned DELETE: cuts through the [300,399] segment → rewrite,
    // exact (the metadata fast path correctly declines)
    sc.sql("DELETE FROM rcat.ns.t WHERE doc_id >= 350 AND doc_id <= 359")
    assert(sc.sql("SELECT COUNT(*) FROM rcat.ns.t").collect()(0).getLong(0) == 400)
    assert(sc.sql("SELECT COUNT(*) FROM rcat.ns.t WHERE doc_id BETWEEN 350 AND 359")
      .collect()(0).getLong(0) == 0)

    // NON-doc_id predicate: no group pruning possible (every segment
    // flows through the rewrite) — rows matching the predicate go,
    // every unmatched row of every segment must be copied through
    val preLang = sc.sql("SELECT COUNT(*) FROM rcat.ns.t WHERE lang = 'xx'")
      .collect()(0).getLong(0)
    assert(preLang == 50) // from the UPDATE above
    sc.sql("DELETE FROM rcat.ns.t WHERE lang = 'xx'")
    assert(sc.sql("SELECT COUNT(*) FROM rcat.ns.t WHERE lang = 'xx'")
      .collect()(0).getLong(0) == 0)
    assert(sc.sql("SELECT COUNT(*) FROM rcat.ns.t").collect()(0).getLong(0) == 350,
      "unmatched rows of fully-rewritten segments must survive")

    // aligned DELETE still takes the metadata-only fast path: on a
    // fresh two-segment table (UPDATE/MERGE above leave segments whose
    // spans no longer align with round windows), the manifest shrinks
    // with NO new segment written
    sc.sql("CREATE TABLE rcat.ns.t2 (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING)")
    (0 until 2).foreach(i => sc.sql("INSERT INTO rcat.ns.t2 " +
      s"SELECT * FROM rl_src WHERE doc_id BETWEEN ${i * 100} AND ${i * 100 + 99}"))
    val t2Dir = java.nio.file.Paths.get(root, "ns", "t2").toString
    val preAligned = DocStore.readManifest(t2Dir).map(_.name)
    sc.sql("DELETE FROM rcat.ns.t2 WHERE doc_id >= 100")
    val postAligned = DocStore.readManifest(t2Dir).map(_.name)
    assert(postAligned.forall(preAligned.contains) &&
      postAligned.size < preAligned.size,
      s"aligned DELETE must drop manifest entries only: $preAligned -> $postAligned")
    assert(sc.sql("SELECT COUNT(*) FROM rcat.ns.t2").collect()(0).getLong(0) == 100)
  }

  test("append after metadata DELETE never reuses a retained segment's name") {
    // r7 advice (medium): DELETE drops manifest entries but RETAINS the
    // files for time travel; a manifest-derived part counter would hand
    // the next append a retained file's name and rename(2) would
    // silently overwrite it, corrupting VERSION AS OF reads.
    val root = Files.createTempDirectory("docstore_del_append").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.dcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.dcat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .coalesce(1).createOrReplaceTempView("del_src")
    sc.sql("CREATE NAMESPACE dcat.ns")
    sc.sql("CREATE TABLE dcat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING)")
    sc.sql("INSERT INTO dcat.ns.t SELECT * FROM del_src WHERE doc_id < 100")
    sc.sql("INSERT INTO dcat.ns.t SELECT * FROM del_src WHERE doc_id BETWEEN 100 AND 199")
    val tableDir = java.nio.file.Paths.get(root, "ns", "t")
    val retained = DocStore.readManifest(tableDir.toString)
      .filter(_.minId >= 100).map(_.name)
    assert(retained.nonEmpty)
    val sizesBefore = retained.map(n =>
      n -> Files.size(tableDir.resolve(n))).toMap

    sc.sql("DELETE FROM dcat.ns.t WHERE doc_id >= 100")
    sc.sql("INSERT INTO dcat.ns.t SELECT * FROM del_src WHERE doc_id BETWEEN 200 AND 299")

    // the new append chose fresh names and left the retained files alone
    val nowNames = DocStore.readManifest(tableDir.toString).map(_.name)
    assert(nowNames.intersect(retained).isEmpty,
      s"append reused retained names: ${nowNames.intersect(retained)}")
    retained.foreach { n =>
      assert(Files.exists(tableDir.resolve(n)), s"retained $n was deleted")
      assert(Files.size(tableDir.resolve(n)) == sizesBefore(n),
        s"retained $n was overwritten")
    }
    // live table = slices A + C; the pre-DELETE snapshot still reads B
    assert(sc.sql("SELECT COUNT(*), MAX(doc_id) FROM dcat.ns.t")
      .collect()(0).toSeq == Seq(200L, 299L))
    assert(sc.sql("SELECT COUNT(*), MAX(doc_id) FROM dcat.ns.t VERSION AS OF 2")
      .collect()(0).toSeq == Seq(200L, 199L))
  }

  test("streaming offsets survive DELETE of read segments; deleting the resume segment fails loudly") {
    // r7 advice: offsets are keyed by segment NAME, not manifest index,
    // so dropping an already-read entry shifts nothing; dropping the
    // checkpointed segment itself must void the checkpoint LOUDLY.
    val tableDir = Files.createTempDirectory("docstore_offsets").toString
    (0 until 4).foreach { i =>
      docs.where(col("doc_id").between(i * 100L, i * 100L + 99L))
        .coalesce(1).write.format("graft-docstore").mode("append")
        .option("path", tableDir).save()
    }
    val names = DocStore.readManifest(tableDir).map(_.name)
    assert(names.size == 4)
    val out = Files.createTempDirectory("docstore_offsets_out").toString
    val ckpt = Files.createTempDirectory("docstore_offsets_ckpt").toString
    def leg(trigger: org.apache.spark.sql.streaming.Trigger): Unit = {
      val q = spark.readStream.format("graft-docstore")
        .option("path", tableDir).option("maxSegmentsPerBatch", "1").load()
        .select("doc_id")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(trigger).start()
      try q.awaitTermination() finally q.stop()
    }
    // legs 1+2: two Trigger.Once batches → segments 0 and 1 read
    leg(org.apache.spark.sql.streaming.Trigger.Once())
    leg(org.apache.spark.sql.streaming.Trigger.Once())
    assert(spark.read.parquet(out).count() == 200)
    // metadata-DELETE the FIRST (already-read) segment, then drain:
    // resume position is after names(1) by NAME → reads exactly 2 and 3
    graft.sources.DocStoreCommitOps.writeManifest(tableDir,
      DocStore.readManifest(tableDir).filterNot(_.name == names(0)), "del0")
    leg(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    val got = spark.read.parquet(out)
    assert(got.count() == 400, "DELETE of a read segment must not skip/re-read")
    assert(got.distinct().count() == 400)

    // now drop the checkpointed resume segment (names(3), the last one
    // committed): restart must fail loudly, not guess an index
    graft.sources.DocStoreCommitOps.writeManifest(tableDir,
      DocStore.readManifest(tableDir).filterNot(_.name == names(3)), "del3")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      leg(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else String.valueOf(t.getMessage) +: messages(t.getCause)
    assert(messages(e).exists(_.contains("no longer in")),
      s"expected a voided-checkpoint error, got: ${messages(e).mkString(" | ")}")
  }

  test("partitioned tables: directory layout, partition pruning, CoW across partitions") {
    val root = Files.createTempDirectory("docstore_part").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.pcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.pcat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .createOrReplaceTempView("part_src")
    sc.sql("CREATE NAMESPACE pcat.ns")
    sc.sql("CREATE TABLE pcat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING) PARTITIONED BY (lang)")
    sc.sql("INSERT INTO pcat.ns.t SELECT * FROM part_src")

    // layout: every manifest name carries its partition subdirectory,
    // and the requested clustered distribution yields ONE segment per
    // partition value for a single INSERT (small-files discipline)
    val names = DocStore.readManifest(s"$root/ns/t").map(_.name)
    assert(names.nonEmpty &&
      names.forall(_.matches("^lang=[^/]+/part-\\d{5}\\.gds$")), names)
    assert(names.size == docs.select("lang").distinct().count(), names)

    // partition pruning on the EXECUTED plan: equality keeps 1 of 5
    // directories, IN keeps 2; results stay row-exact (the predicate
    // remains residual) against the source of truth
    val q1 = sc.sql("SELECT COUNT(*) c, SUM(n_chars) s FROM pcat.ns.t WHERE lang = 'en'")
    assert(physical(q1).contains(s"segments=1/${names.size}"), physical(q1))
    val expect1 = docs.where(col("lang") === "en")
      .agg(count(lit(1)), sum("n_chars")).collect()(0).toSeq
    assert(q1.collect()(0).toSeq == expect1)
    val q2 = sc.sql("SELECT COUNT(*) FROM pcat.ns.t WHERE lang IN ('en','de')")
    assert(physical(q2).contains(s"segments=2/${names.size}"), physical(q2))

    // a null partition value lands under the null marker and only
    // IS NULL scans it; a value that COLLIDES with the marker text
    // encodes differently, so the two never alias
    sc.sql("INSERT INTO pcat.ns.t VALUES (9001, 1, NULL, 's', 't'), " +
      "(9002, 1, '__null__', 's', 't')")
    val withNull = DocStore.readManifest(s"$root/ns/t").map(_.name)
    assert(withNull.exists(_.startsWith("lang=__null__/")), withNull)
    assert(withNull.exists(_.startsWith("lang=%5F%5Fnull%5F%5F/")), withNull)
    val qn = sc.sql("SELECT doc_id FROM pcat.ns.t WHERE lang IS NULL")
    assert(physical(qn).contains(s"segments=1/${withNull.size}"), physical(qn))
    assert(qn.collect().map(_.getLong(0)).toSeq == Seq(9001L))
    assert(sc.sql("SELECT doc_id FROM pcat.ns.t WHERE lang = '__null__'")
      .collect().map(_.getLong(0)).toSeq == Seq(9002L))

    // copy-on-write UPDATE that changes the partition column moves the
    // rows to their new directory; totals and the untouched partitions'
    // files survive by name
    val before = DocStore.readManifest(s"$root/ns/t").map(_.name).toSet
    sc.sql("UPDATE pcat.ns.t SET lang = 'zz' WHERE lang = 'de'")
    val after = DocStore.readManifest(s"$root/ns/t").map(_.name)
    assert(after.exists(_.startsWith("lang=zz/")), after)
    assert(!after.exists(_.startsWith("lang=de/")), after)
    assert((before - after.find(_.startsWith("lang=de/")).getOrElse(""))
      .filterNot(_.startsWith("lang=de/")).subsetOf(after.toSet),
      "untouched partitions must survive by name")
    assert(sc.sql("SELECT COUNT(*) FROM pcat.ns.t").collect()(0).getLong(0) ==
      docs.count() + 2)

    // bucket(n, doc_id): a point probe prunes to one bucket directory
    sc.sql("CREATE TABLE pcat.ns.b (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING) " +
      "PARTITIONED BY (bucket(4, doc_id))")
    sc.sql("INSERT INTO pcat.ns.b SELECT * FROM part_src")
    val bNames = DocStore.readManifest(s"$root/ns/b").map(_.name)
    assert(bNames.forall(_.matches("^doc_id_bucket=[0-3]/part-\\d{5}\\.gds$")),
      bNames)
    val qb = sc.sql("SELECT text FROM pcat.ns.b WHERE doc_id = 123")
    assert(physical(qb).contains(s"segments=1/${bNames.size}"), physical(qb))
    assert(qb.collect().length == 1)

    // TRUNCATE sweeps partition subdirectories too
    sc.sql("TRUNCATE TABLE pcat.ns.b")
    assert(sc.sql("SELECT COUNT(*) FROM pcat.ns.b").collect()(0).getLong(0) == 0)
    import scala.jdk.CollectionConverters._
    val leftover = {
      val st = Files.walk(java.nio.file.Paths.get(root, "ns", "b"))
      try st.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".gds")).toVector
      finally st.close()
    }
    assert(leftover.isEmpty, s"truncate must sweep partition dirs: $leftover")

    // vacuum reclaims the UPDATE-replaced files under partition dirs
    val reclaimed = sc.sql("CALL pcat.system.vacuum('ns.t')")
      .collect()(0).getLong(0)
    assert(reclaimed > 0, "vacuum must reclaim the replaced de-partition file")
    assert(sc.sql("SELECT COUNT(*) FROM pcat.ns.t").collect()(0).getLong(0) ==
      docs.count() + 2, "vacuum must not change table content")

    // DDL validation is loud: time transforms have no column to apply
    // to, bucket is doc_id-only, merge-on-read stays unpartitioned
    intercept[Exception] { sc.sql("CREATE TABLE pcat.ns.x1 (doc_id BIGINT " +
      "NOT NULL, n_chars BIGINT, lang STRING, source STRING, text STRING) " +
      "PARTITIONED BY (days(lang))") }
    intercept[Exception] { sc.sql("CREATE TABLE pcat.ns.x2 (doc_id BIGINT " +
      "NOT NULL, n_chars BIGINT, lang STRING, source STRING, text STRING) " +
      "PARTITIONED BY (bucket(4, n_chars))") }
    intercept[Exception] { sc.sql("CREATE TABLE pcat.ns.x3 (doc_id BIGINT " +
      "NOT NULL, n_chars BIGINT, lang STRING, source STRING, text STRING) " +
      "PARTITIONED BY (lang) " +
      "TBLPROPERTIES ('graft.rowlevel.mode' = 'merge-on-read')") }

    // partitioned CTAS carries the spec; SHOW CREATE reports it
    sc.sql("CREATE TABLE pcat.ns.c PARTITIONED BY (lang) AS " +
      "SELECT * FROM part_src WHERE doc_id < 100")
    assert(DocStore.readManifest(s"$root/ns/c").map(_.name)
      .forall(_.startsWith("lang=")))
    assert(sc.sql("SELECT COUNT(*) FROM pcat.ns.c").collect()(0).getLong(0) == 100)
    assert(sc.sql("SHOW CREATE TABLE pcat.ns.c").collect()(0).getString(0)
      .contains("PARTITIONED BY"))
  }

  test("legacy index-keyed checkpoints migrate in range, refuse past the manifest") {
    // r8 advice: the legacy {"segment":N} migration maps an INDEX
    // against the CURRENT list; an index beyond the list proves a
    // DELETE shrank it since the checkpoint — clamping would silently
    // re-position the reader, so it must refuse loudly instead
    import graft.sources.{DocStore, DocStoreMicroBatchStream, DocStoreOffset}
    val segs = Seq(
      DocStore.Segment("part-00000.gds", 10, 0, 9, 100),
      DocStore.Segment("part-00001.gds", 10, 10, 19, 100))
    val ms = new DocStoreMicroBatchStream("/nonexistent-table",
      DocStore.SCHEMA, segs, DocStore.SCHEMA,
      Long.MinValue, Long.MaxValue, 1)
    assert(ms.deserializeOffset("""{"segment":1}""")
      .asInstanceOf[DocStoreOffset].after == "part-00000.gds")
    val e2 = intercept[IllegalStateException] {
      ms.deserializeOffset("""{"segment":3}""")
    }
    assert(e2.getMessage.contains("exceeds"))
  }

  test("concurrent appends both survive (commit lock serializes manifest updates)") {
    // r7 advice: without the commit lock, two concurrent appends read
    // the same `old` manifest and the loser's segments vanish (lost
    // update). Race 8 thread-pairs; every slice must be present.
    val tableDir = Files.createTempDirectory("docstore_concurrent").toString
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writes = (0 until 8).map { i =>
      Future {
        docs.where(col("doc_id").between(i * 50L, i * 50L + 49L))
          .coalesce(1).write.format("graft-docstore").mode("append")
          .option("path", tableDir).save()
      }
    }
    Await.result(Future.sequence(writes), 120.seconds)
    val back = spark.read.format("graft-docstore")
      .option("path", tableDir).load()
    assert(back.count() == 400, "a concurrent append was lost")
    assert(back.select("doc_id").distinct().count() == 400)
    assert(DocStore.readManifest(tableDir).size == 8)
    // r13: the version-log checkpoint is maintained INSIDE the same
    // commit lock, so racing appends must leave it covering every
    // retained version with the exact per-version summaries the
    // fallback walk computes
    val vts = graft.sources.DocStoreCommitOps.versionTimes(tableDir)
    val ck = graft.sources.DocStoreCommitOps.readCheckpoint(tableDir)
    assert(ck.keySet == vts.map(_._1).toSet, s"${ck.keySet} vs $vts")
    import org.apache.spark.sql.types.{BooleanType, LongType, TimestampType}
    val histTypes = Seq(LongType, LongType, LongType, LongType,
      BooleanType, TimestampType)
    def hist() = graft.sources.DocStoreMetaTables.historyRows(tableDir)
      .map(_.toSeq(histTypes).toList).toSeq
    val served = hist()
    Files.delete(java.nio.file.Paths.get(tableDir,
      graft.sources.DocStoreCommitOps.CHECKPOINT_FILE))
    assert(hist() == served,
      "checkpoint-served history must equal the per-version walk")
  }

  test("schema evolution: ADD COLUMN null-pads old segments, new writes persist it") {
    val root = Files.createTempDirectory("docstore_evolve").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.ecat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.ecat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .coalesce(1).createOrReplaceTempView("ev_src")
    sc.sql("CREATE NAMESPACE ecat.ns")
    sc.sql("CREATE TABLE ecat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING)")
    sc.sql("INSERT INTO ecat.ns.t SELECT * FROM ev_src WHERE doc_id < 100")
    val tableDir = java.nio.file.Paths.get(root, "ns", "t").toString
    val oldSegments = DocStore.readManifest(tableDir).map(_.name)

    sc.sql("ALTER TABLE ecat.ns.t ADD COLUMN quality BIGINT")
    sc.sql("ALTER TABLE ecat.ns.t ADD COLUMN split STRING")
    // no rewrite: the pre-evolution segment files are untouched
    assert(DocStore.readManifest(tableDir).map(_.name) == oldSegments)
    assert(sc.table("ecat.ns.t").schema.fieldNames.toSeq ==
      Seq("doc_id", "n_chars", "lang", "source", "text", "quality", "split"))

    // old rows read null-padded; aggregation over the new column works
    assert(sc.sql("SELECT COUNT(*), COUNT(quality) FROM ecat.ns.t")
      .collect()(0).toSeq == Seq(100L, 0L))

    // new writes persist the evolved columns (with nulls interleaved)
    sc.sql("""INSERT INTO ecat.ns.t
      SELECT doc_id + 1000, n_chars, lang, source, text,
             CASE WHEN doc_id % 2 = 0 THEN doc_id * 7 END AS quality,
             CASE WHEN doc_id % 3 = 0 THEN 'train' END AS split
      FROM ev_src WHERE doc_id < 100""")
    val got = sc.sql("""
      SELECT COUNT(*) AS n, COUNT(quality) AS nq, SUM(quality) AS sq,
             COUNT(CASE WHEN split = 'train' THEN 1 END) AS nt
      FROM ecat.ns.t""").collect()(0)
    assert(got.toSeq == Seq(200L, 50L,
      (0L until 100L by 2).map(_ * 7).sum, 34L))

    // evolved-column projection prunes: reading ONLY `quality` must not
    // decode the text section (byte-skip still works across GDS1+GDS2)
    val q = sc.sql("SELECT quality FROM ecat.ns.t")
    val cols = "cols=\\[([^\\]]*)\\]".r
      .findFirstMatchIn(q.queryExecution.executedPlan.toString).get.group(1)
    assert(cols == "quality", cols)

    // evolved table round-trips through row-level UPDATE too
    sc.sql("UPDATE ecat.ns.t SET quality = -1 WHERE doc_id < 100")
    assert(sc.sql("SELECT COUNT(*) FROM ecat.ns.t WHERE quality = -1")
      .collect()(0).getLong(0) == 100)

    // RENAME COLUMN + INT -> BIGINT widening: both pure metadata under
    // positional identity — ZERO data files rewritten (pinned by name
    // AND size), values readable across both generations
    sc.sql("ALTER TABLE ecat.ns.t ADD COLUMN score INT")
    sc.sql("""INSERT INTO ecat.ns.t
      SELECT doc_id + 2000, n_chars, lang, source, text,
             NULL, NULL, CAST(doc_id AS INT)
      FROM ev_src WHERE doc_id < 50""")
    val preAlter = DocStore.readManifest(tableDir)
      .map(s => (s.name, s.bytes)).toSet
    sc.sql("ALTER TABLE ecat.ns.t RENAME COLUMN score TO stars")
    sc.sql("ALTER TABLE ecat.ns.t ALTER COLUMN stars TYPE BIGINT")
    assert(DocStore.readManifest(tableDir)
      .map(s => (s.name, s.bytes)).toSet == preAlter,
      "rename/widen must rewrite zero data files")
    assert(sc.table("ecat.ns.t").schema("stars").dataType ==
      org.apache.spark.sql.types.LongType)
    // pre-widening values read unchanged through the widened type, and
    // post-widening inserts take full BIGINT range
    sc.sql("""INSERT INTO ecat.ns.t
      SELECT doc_id + 3000, n_chars, lang, source, text,
             NULL, NULL, doc_id + 3000000000
      FROM ev_src WHERE doc_id < 50""")
    val w = sc.sql("""SELECT COUNT(stars), SUM(stars), MAX(stars)
      FROM ecat.ns.t""").collect()(0)
    assert(w.getLong(0) == 100)
    assert(w.getLong(1) == (0L until 50).sum * 2 + 50L * 3000000000L)
    assert(w.getLong(2) == 3000000049L)

    // guardrails: unsupported evolution refuses (DROP COLUMN of added
    // columns is SUPPORTED since r11 via column mapping, r13 opened
    // the full primitive surface, and r15 opened nested TYPES with
    // scalar leaves — only a bad LEAF refuses now)
    intercept[Exception] {
      sc.sql("ALTER TABLE ecat.ns.t ADD COLUMN bad ARRAY<BINARY>") }
    // base columns are the format contract: no rename, no retype
    intercept[Exception] {
      sc.sql("ALTER TABLE ecat.ns.t RENAME COLUMN lang TO language") }
    intercept[Exception] {
      sc.sql("ALTER TABLE ecat.ns.t ALTER COLUMN n_chars TYPE INT") }
    // narrowing an added column refuses too
    intercept[Exception] {
      sc.sql("ALTER TABLE ecat.ns.t ALTER COLUMN stars TYPE INT") }
  }

  test("CALL system.vacuum reclaims unreferenced files; system.history lists versions") {
    val root = Files.createTempDirectory("docstore_proc").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.pcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.pcat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .coalesce(1).createOrReplaceTempView("proc_src")
    sc.sql("CREATE NAMESPACE pcat.ns")
    sc.sql("CREATE TABLE pcat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING)")
    (0 until 3).foreach(i => sc.sql("INSERT INTO pcat.ns.t " +
      s"SELECT * FROM proc_src WHERE doc_id BETWEEN ${i * 100} AND ${i * 100 + 99}"))
    sc.sql("UPDATE pcat.ns.t SET lang = 'zz' WHERE doc_id BETWEEN 100 AND 149")

    // history: 4 versions (3 inserts + the UPDATE), latest flagged current
    val hist = sc.sql("CALL pcat.system.history('ns.t')")
      .collect().map(_.toSeq)
    assert(hist.length == 4, hist.mkString("\n"))
    assert(hist.count(_(4) == true) == 1)
    assert(hist.maxBy(_.head.asInstanceOf[Long]).apply(4) == true)
    // committed_at is strictly monotone in version order (the publish
    // path bumps clock ties forward — TIMESTAMP AS OF depends on it)
    val commitTimes = hist.sortBy(_.head.asInstanceOf[Long])
      .map(_(5).asInstanceOf[java.sql.Timestamp].getTime)
    assert(commitTimes.zip(commitTimes.tail).forall(p => p._1 < p._2),
      commitTimes.mkString(","))

    // the UPDATE retained its replaced segment on disk → vacuum finds it
    val tableDir = java.nio.file.Paths.get(root, "ns", "t")
    def gdsFiles = {
      import scala.jdk.CollectionConverters._
      val st = Files.list(tableDir)
      try st.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".gds")).toVector.sorted
      finally st.close()
    }
    val live = DocStore.readManifest(tableDir.toString).map(_.name).sorted
    val preVacuum = gdsFiles
    assert(preVacuum.size > live.size, "expected a retained replaced segment")

    val vac = sc.sql("CALL pcat.system.vacuum('ns.t')").collect()(0)
    assert(vac.getLong(0) == (preVacuum.size - live.size).toLong)
    assert(vac.getLong(1) > 0)
    assert(gdsFiles == live, "vacuum must leave exactly the live segments")
    // table content untouched; history reset to one current version
    assert(sc.sql("SELECT COUNT(*), COUNT(CASE WHEN lang='zz' THEN 1 END) " +
      "FROM pcat.ns.t").collect()(0).toSeq == Seq(300L, 50L))
    val hist2 = sc.sql("CALL pcat.system.history('ns.t')").collect()
    assert(hist2.length == 1 && hist2(0).getBoolean(4))
    // and VERSION AS OF the reset snapshot still reads
    assert(sc.sql("SELECT COUNT(*) FROM pcat.ns.t VERSION AS OF 1")
      .collect()(0).getLong(0) == 300)
  }

  test("_segment metadata column is selectable on plain reads, zero extra IO") {
    val seg = store.select(col("_segment"), col("doc_id"))
    val byFile = seg.groupBy("_segment").count().collect()
    assert(byFile.length == 8, byFile.mkString(","))
    assert(byFile.map(_.getLong(1)).sum == 500)
    assert(byFile.forall(_.getString(0).endsWith(".gds")))
    // the metadata column must not defeat section skipping: a
    // (_segment, lang) projection still reads no text bytes
    val plan = physical(store.select("_segment", "lang"))
    val cols = "cols=\\[([^\\]]*)\\]".r.findFirstMatchIn(plan).get.group(1)
    assert(!cols.contains("text"), plan)
    // and rows from one segment agree with a doc_id-bounded read
    val one = byFile.minBy(_.getString(0))
    val viaMeta = store.where(col("_segment") === one.getString(0)).count()
    assert(viaMeta == one.getLong(1))
  }

  test("staged CTAS/RTAS: atomic publish; a failed REPLACE leaves the old table intact") {
    val root = Files.createTempDirectory("docstore_ctas").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.scat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.scat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .coalesce(1).createOrReplaceTempView("ctas_src")
    sc.sql("CREATE NAMESPACE scat.ns")

    // CTAS: table appears complete (directory rename is the publish)
    sc.sql("CREATE TABLE scat.ns.t AS SELECT * FROM ctas_src WHERE doc_id < 200")
    assert(sc.sql("SELECT COUNT(*), MAX(doc_id) FROM scat.ns.t")
      .collect()(0).toSeq == Seq(200L, 199L))
    // no staging litter after commit
    import scala.jdk.CollectionConverters._
    def stgDirs = {
      val st = Files.list(java.nio.file.Paths.get(root, "ns"))
      try st.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith(".stg-ctas")).toVector
      finally st.close()
    }
    assert(stgDirs.isEmpty, stgDirs.mkString(","))

    // RTAS: content swap with old-or-new visibility; replaced segment
    // files are RETAINED for vacuum (r8 advice) so a reader that
    // planned against the old manifest can finish its scan
    val gen1Names =
      graft.sources.DocStore.readManifest(s"$root/ns/t").map(_.name)
    sc.sql("REPLACE TABLE scat.ns.t AS SELECT * FROM ctas_src WHERE doc_id < 100")
    assert(sc.sql("SELECT COUNT(*), MAX(doc_id) FROM scat.ns.t")
      .collect()(0).toSeq == Seq(100L, 99L))
    assert(gen1Names.nonEmpty && gen1Names.forall(n =>
      Files.exists(java.nio.file.Paths.get(root, "ns", "t", n))),
      s"RTAS must retain replaced segment files for vacuum: $gen1Names")

    // a REPLACE whose query FAILS mid-write must leave the old table
    // untouched (the non-staging path would have dropped it first)
    intercept[Exception] {
      sc.sql("REPLACE TABLE scat.ns.t AS " +
        "SELECT doc_id, n_chars, lang, source, " +
        "CASE WHEN doc_id > 50 THEN raise_error('boom') ELSE text END AS text " +
        "FROM ctas_src")
    }
    assert(sc.sql("SELECT COUNT(*), MAX(doc_id) FROM scat.ns.t")
      .collect()(0).toSeq == Seq(100L, 99L),
      "failed RTAS must not disturb the old table")
    assert(stgDirs.isEmpty, "failed RTAS must clean its staging dir")

    // CTAS can carry an evolved schema from birth — including a
    // computed column Spark infers NON-nullable (doc_id * 2), which
    // the catalog coerces to the nullable stored form instead of
    // refusing (post-review fix)
    sc.sql("CREATE TABLE scat.ns.scored AS " +
      "SELECT doc_id, n_chars, lang, source, text, doc_id * 2 AS quality " +
      "FROM ctas_src WHERE doc_id < 50")
    assert(sc.sql("SELECT COUNT(*), SUM(quality) FROM scat.ns.scored")
      .collect()(0).getLong(0) == 50)
    // and a non-docstore-shaped CTAS refuses loudly
    intercept[Exception] {
      sc.sql("CREATE TABLE scat.ns.bad AS SELECT 1 AS x") }

    // an in-flight (or crashed) CTAS staging dir carries a MANIFEST
    // but must never surface as a table (post-review fix)
    val phantom = java.nio.file.Paths.get(root, "ns", ".stg-ctas-phantom-1")
    Files.createDirectories(phantom)
    Files.write(phantom.resolve("MANIFEST"), Array.empty[Byte])
    val listed = sc.sql("SHOW TABLES IN scat.ns")
      .collect().map(_.getString(1)).toSet
    assert(!listed.exists(_.startsWith(".stg")), listed.mkString(","))
  }

  test("merge-on-read: DELETE/UPDATE write deletion vectors, zero segments rewritten") {
    val root = Files.createTempDirectory("docstore_mor").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.mcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.mcat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .coalesce(1).createOrReplaceTempView("mor_src")
    sc.sql("CREATE NAMESPACE mcat.ns")
    sc.sql("CREATE TABLE mcat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING) " +
      "TBLPROPERTIES ('graft.rowlevel.mode' = 'merge-on-read')")
    (0 until 4).foreach(i => sc.sql("INSERT INTO mcat.ns.t " +
      s"SELECT * FROM mor_src WHERE doc_id BETWEEN ${i * 100} AND ${i * 100 + 99}"))
    val tableDir = java.nio.file.Paths.get(root, "ns", "t").toString
    def names = DocStore.readManifest(tableDir).map(_.name)
    def dvCount = DocStore.readDeletes(tableDir).values.map(_.length).sum
    val before = names

    // misaligned DELETE: under merge-on-read this is METADATA — the
    // manifest gains DV lines, no segment file is rewritten
    sc.sql("DELETE FROM mcat.ns.t WHERE doc_id BETWEEN 150 AND 159")
    assert(names == before, "MoR DELETE must not rewrite segments")
    assert(dvCount == 10, s"expected 10 DV entries, got $dvCount")
    assert(sc.sql("SELECT COUNT(*) FROM mcat.ns.t").collect()(0).getLong(0) == 390)
    assert(sc.sql("SELECT COUNT(*) FROM mcat.ns.t WHERE doc_id BETWEEN 150 AND 159")
      .collect()(0).getLong(0) == 0)
    // the pre-DELETE snapshot still reads the rows (DVs are versioned
    // with the manifest)
    assert(sc.sql("SELECT COUNT(*) FROM mcat.ns.t VERSION AS OF 4")
      .collect()(0).getLong(0) == 400)

    // UPDATE: DV on the old row position + reinsert into a new segment
    sc.sql("UPDATE mcat.ns.t SET lang = 'mm' WHERE doc_id BETWEEN 200 AND 219")
    assert(before.forall(names.contains),
      "MoR UPDATE must keep every original segment")
    assert(names.size == before.size + 1, s"$before -> $names")
    assert(dvCount == 30)
    assert(sc.sql("SELECT COUNT(*) FROM mcat.ns.t").collect()(0).getLong(0) == 390)
    assert(sc.sql("SELECT COUNT(*) FROM mcat.ns.t WHERE lang = 'mm'")
      .collect()(0).getLong(0) == 20)
    // no duplicates: each updated doc_id appears exactly once
    assert(sc.sql("SELECT COUNT(DISTINCT doc_id) FROM mcat.ns.t")
      .collect()(0).getLong(0) == 390)

    // MERGE: matched rows delete+reinsert, unmatched insert
    sc.sql("SELECT doc_id, n_chars * 5 AS n_chars, lang, source, text " +
      "FROM mor_src WHERE doc_id BETWEEN 0 AND 9 " +
      "UNION ALL SELECT doc_id + 5000, n_chars, lang, source, text " +
      "FROM mor_src WHERE doc_id BETWEEN 10 AND 19")
      .createOrReplaceTempView("mor_merge_src")
    sc.sql("""MERGE INTO mcat.ns.t t USING mor_merge_src s ON t.doc_id = s.doc_id
              WHEN MATCHED THEN UPDATE SET n_chars = s.n_chars
              WHEN NOT MATCHED THEN INSERT *""")
    assert(sc.sql("SELECT COUNT(*) FROM mcat.ns.t").collect()(0).getLong(0) == 400)
    val merged = sc.sql(
      "SELECT SUM(n_chars) FROM mcat.ns.t WHERE doc_id BETWEEN 0 AND 9")
      .collect()(0).getLong(0)
    val expect5x = sc.sql(
      "SELECT SUM(n_chars) * 5 FROM mor_src WHERE doc_id BETWEEN 0 AND 9")
      .collect()(0).getLong(0)
    assert(merged == expect5x)

    // metadata-only aggregates must DECLINE on a DV'd table (manifest
    // counts are pre-delete) and fall back to the reading scan
    val agg = sc.sql("SELECT COUNT(*), MIN(doc_id), MAX(doc_id) FROM mcat.ns.t")
    assert(!agg.queryExecution.executedPlan.toString.contains("manifest-only"),
      agg.queryExecution.executedPlan.toString)
    assert(agg.collect()(0).getLong(0) == 400)

    // compaction (connector overwrite) applies and purges the DVs
    sc.read.format("graft-docstore").option("path", tableDir).load()
      .repartitionByRange(2, col("doc_id"))
      .write.format("graft-docstore").mode("overwrite")
      .option("path", tableDir).save()
    assert(dvCount == 0, "compaction must purge deletion vectors")
    assert(sc.sql("SELECT COUNT(*) FROM mcat.ns.t").collect()(0).getLong(0) == 400)
    assert(sc.sql("SELECT COUNT(*) FROM mcat.ns.t WHERE doc_id BETWEEN 150 AND 159")
      .collect()(0).getLong(0) == 0, "deleted rows must stay deleted")
  }

  test("_pos metadata column: absolute ordinals, stable under pushed bounds") {
    val seg = store.where(col("doc_id") >= 100 && col("doc_id") <= 120)
      .select("_segment", "_pos", "doc_id").collect()
    assert(seg.length == 21)
    // the lake is range-partitioned and sorted by doc_id, so positions
    // within one segment must be consecutive ABSOLUTE ordinals even
    // under the pushed bound (not renumbered from zero post-filter)
    val bySeg = seg.groupBy(_.getString(0))
    bySeg.values.foreach { rows =>
      val ps = rows.map(_.getLong(1)).sorted
      assert(ps.zip(ps.tail).forall { case (a, b) => b == a + 1 }, ps.toSeq)
    }
    val ids = store.select("_segment", "_pos", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ids.size == 500, "(_segment,_pos) must be a unique row id")
  }

  test("merge-on-read commit detects a concurrent delete of the same row") {
    // both ops scanned the same pre-state and target the same (segment,
    // pos): the second commit must conflict, not duplicate/resurrect
    val tableDir = Files.createTempDirectory("docstore_mor_conflict").toString
    docs.where(col("doc_id") < 100).coalesce(1)
      .write.format("graft-docstore").mode("append")
      .option("path", tableDir).save()
    val seg = DocStore.readManifest(tableDir).head.name
    def deltaCommit(qid: String): Unit =
      new graft.sources.DocStoreDeltaBatchWrite(
        tableDir, DocStore.SCHEMA, Array(0, 1, 2, 3, 4), qid)
        .commit(Array(graft.sources.DocStoreDeltaCommit(
          s".stg-$qid", 0L, Long.MaxValue, Long.MinValue, 0L,
          Seq((seg, 7L)))))
    deltaCommit("mor-a") // first wins
    val e = intercept[IllegalStateException] { deltaCommit("mor-b") }
    assert(e.getMessage.contains("concurrent write conflict"), e.getMessage)
    // first delete applied exactly once
    assert(DocStore.readDeletes(tableDir)(seg).toSeq == Seq(7L))
    assert(spark.read.format("graft-docstore").option("path", tableDir)
      .load().count() == 99)
  }

  test("row-level commit detects a concurrent rewrite of a scanned segment") {
    // the rewrite was computed FROM the scanned segments; if another
    // writer replaced one before our commit, committing anyway would
    // resurrect its pre-image rows — must fail loudly (post-review fix)
    val tableDir = Files.createTempDirectory("docstore_conflict").toString
    docs.where(col("doc_id") < 100).coalesce(1)
      .write.format("graft-docstore").mode("append")
      .option("path", tableDir).save()
    val op = new graft.sources.DocStoreRowLevelOperation(tableDir,
      org.apache.spark.sql.connector.write.RowLevelOperation.Command.UPDATE)
    op.scannedSegments = DocStore.readManifest(tableDir).map(_.name)
    // simulate the concurrent winner: replace the table content so the
    // scanned segment name is no longer live
    docs.where(col("doc_id") < 50).coalesce(1)
      .write.format("graft-docstore").mode("overwrite")
      .option("path", tableDir).save()
    val write = new graft.sources.DocStoreReplaceDataWrite(
      tableDir, DocStore.SCHEMA, Array(0, 1, 2, 3, 4), "conflict-test", op)
    val e = intercept[IllegalStateException] {
      write.commit(Array.empty)
    }
    assert(e.getMessage.contains("concurrent write conflict"), e.getMessage)
    // the concurrent winner's table is intact
    assert(spark.read.format("graft-docstore").option("path", tableDir)
      .load().count() == 50)
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

  test("segments read option prunes by name at plan time, fails loudly on unknowns") {
    val pick = DocStore.readManifest(lake).map(_.name).take(2)
    val sub = spark.read.format("graft-docstore").option("path", lake)
      .option("segments", pick.mkString(",")).load()
    val plan = physical(sub)
    val m = "segments=(\\d+)/(\\d+)".r.findFirstMatchIn(plan).get
    assert(m.group(1).toInt == 2, s"subset must plan exactly 2 segments:\n$plan")
    // row-identical to filtering the full scan on _segment post-hoc
    val want = store.select(col("doc_id"), col("_segment"))
      .filter(col("_segment").isin(pick: _*)).count()
    assert(sub.count() == want && want > 0)
    val bad = intercept[Exception] {
      spark.read.format("graft-docstore").option("path", lake)
        .option("segments", "no-such-segment.gds").load().count()
    }
    assert(bad.getMessage.contains("no-such-segment.gds"), bad.getMessage)
  }

  test("change data feed: snapshot diff yields inserts, deletes, and DV-delta rows") {
    val root = Files.createTempDirectory("docstore_cdf").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.ccat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.ccat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .coalesce(1).createOrReplaceTempView("cdf_src")
    sc.sql("CREATE NAMESPACE ccat.ns")
    sc.sql("CREATE TABLE ccat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING) " +
      "TBLPROPERTIES ('graft.rowlevel.mode' = 'merge-on-read')")
    (0 until 4).foreach(i => sc.sql("INSERT INTO ccat.ns.t " +
      s"SELECT * FROM cdf_src WHERE doc_id BETWEEN ${i * 100} AND ${i * 100 + 99}"))
    val tableDir = java.nio.file.Paths.get(root, "ns", "t").toString
    val vBase = graft.sources.DocStoreCommitOps.nextVersion(tableDir) - 1

    sc.sql("DELETE FROM ccat.ns.t WHERE doc_id BETWEEN 150 AND 159") // DVs
    sc.sql("UPDATE ccat.ns.t SET lang = 'mm' " +
      "WHERE doc_id BETWEEN 200 AND 204") // DV + reinsert
    sc.sql("INSERT INTO ccat.ns.t " +
      "SELECT * FROM cdf_src WHERE doc_id BETWEEN 400 AND 499")
    val vHead = graft.sources.DocStoreCommitOps.nextVersion(tableDir) - 1

    val ch = graft.sources.DocStoreCdf.changesBetween(sc, tableDir, vBase, vHead)
    def ids(typ: String) = ch.filter(col("_change_type") === typ)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids("delete") == ((150L to 159L) ++ (200L to 204L)).sorted,
      "deletes must be the DV'd rows (explicit DELETE + UPDATE's old rows)")
    assert(ids("insert") == ((200L to 204L) ++ (400L to 499L)).sorted,
      "inserts must be the UPDATE reinserts + the appended segment rows")
    // the reinserted rows carry the POST-update values
    val relangs = ch.filter(col("_change_type") === "insert" &&
        col("doc_id").between(200, 204))
      .select("lang").collect().map(_.getString(0)).toSet
    assert(relangs == Set("mm"))
    // a degenerate range is empty, with the CDF schema intact
    val empty = graft.sources.DocStoreCdf.changesBetween(sc, tableDir, vHead, vHead)
    assert(empty.count() == 0)
    assert(empty.columns.contains("_change_type") &&
      empty.columns.contains("_commit_version"))
  }

  test("change feed emits reinstated rows: RESTORE across a MoR DELETE " +
      "shows un-deletes as inserts on BOTH faces") {
    // Delta's RESTORE-emits-CDF contract: a restore that republishes a
    // pre-delete deletion vector REINSTATES rows, and the change feed
    // must say so — before the r19 fix the DV delta only tracked
    // growth, so every CDC consumer silently missed un-deletes
    val root = Files.createTempDirectory("docstore_undel").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.ucat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.ucat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .coalesce(1).createOrReplaceTempView("undel_src")
    sc.sql("CREATE NAMESPACE ucat.ns")
    sc.sql("CREATE TABLE ucat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING) " +
      "TBLPROPERTIES ('graft.rowlevel.mode' = 'merge-on-read')")
    sc.sql("INSERT INTO ucat.ns.t " +
      "SELECT * FROM undel_src WHERE doc_id BETWEEN 0 AND 99")
    val tableDir = java.nio.file.Paths.get(root, "ns", "t").toString
    val vGood = graft.sources.DocStoreCommitOps.nextVersion(tableDir) - 1
    sc.sql("DELETE FROM ucat.ns.t WHERE doc_id BETWEEN 10 AND 14")
    val vDel = graft.sources.DocStoreCommitOps.nextVersion(tableDir) - 1
    sc.sql(s"CALL ucat.system.restore('ns.t', $vGood)")
    val vRest = graft.sources.DocStoreCommitOps.nextVersion(tableDir) - 1
    // batch face 1: changesBetween over the restore commit alone
    val ch = graft.sources.DocStoreCdf
      .changesBetween(sc, tableDir, vDel, vRest)
    val ins = ch.filter(col("_change_type") === "insert")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ins == (10L to 14L),
      s"the restore commit must emit the reinstated rows as inserts: $ins")
    assert(ch.filter(col("_change_type") === "delete").count() == 0)
    // batch face 2 (the reader-option face both streams and ann_sync
    // plan through): same window, same classification
    val ch2 = sc.read.format("graft-docstore").option("path", tableDir)
      .option("readChangeFeed", "true")
      .option("startingVersion", vRest.toString)
      .option("endingVersion", vRest.toString).load()
    val ins2 = ch2.filter(col("_change_type") === "insert")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ins2 == (10L to 14L), s"planner face must agree: $ins2")
    // and the whole window nets out per Delta semantics: the delete
    // AND the reinstatement both appear, attributed to their commits
    val all = graft.sources.DocStoreCdf
      .changesBetween(sc, tableDir, vGood, vRest)
      .filter(col("doc_id").between(10, 14))
      .select("_change_type", "_commit_version").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(all.count(_ == ("delete", vDel)) == 5 &&
      all.count(_ == ("insert", vRest)) == 5,
      s"exact per-commit attribution across the round-trip: $all")
  }

  test("runtime-filter attrs decline when doc_id is pruned from the projection") {
    // regression: filterAttributes() unconditionally advertised doc_id,
    // so ANY plan whose docstore scan did not project it — a DML whose
    // condition+assignments never mention doc_id, or a join keyed on
    // other columns — failed analysis in Spark's PartitionPruning with
    // "Unable to resolve doc_id". Both shapes must plan and run.
    val root = Files.createTempDirectory("docstore_nofid").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.fcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.fcat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .createOrReplaceTempView("nofid_src")
    sc.sql("CREATE NAMESPACE fcat.ns")
    sc.sql("CREATE TABLE fcat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING) " +
      "TBLPROPERTIES ('graft.rowlevel.mode' = 'merge-on-read')")
    sc.sql("INSERT INTO fcat.ns.t SELECT * FROM nofid_src")
    sc.sql("UPDATE fcat.ns.t SET n_chars = n_chars + 7 WHERE lang = 'es'")
    sc.sql("DELETE FROM fcat.ns.t WHERE source = 'src2'")
    val got = sc.sql("SELECT SUM(n_chars) FROM fcat.ns.t").collect()(0).getLong(0)
    val want = sc.sql("SELECT SUM(n_chars + CASE WHEN lang = 'es' THEN 7 ELSE 0 END) " +
      "FROM nofid_src WHERE source <> 'src2'").collect()(0).getLong(0)
    assert(got == want)
    // join on a non-doc_id key with doc_id pruned away still plans
    import spark.implicits._
    val dim = Seq(("es", 1), ("fr", 2)).toDF("lang", "w")
    val t = sc.table("fcat.ns.t").select("lang", "n_chars")
    assert(t.join(dim, "lang").count() > 0)
  }

  test("system.restore republishes a snapshot incl. DVs; refuses vacuumed history") {
    val root = Files.createTempDirectory("docstore_restore").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.rcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.rcat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .coalesce(1).createOrReplaceTempView("rst_src")
    sc.sql("CREATE NAMESPACE rcat.ns")
    sc.sql("CREATE TABLE rcat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING) " +
      "TBLPROPERTIES ('graft.rowlevel.mode' = 'merge-on-read')")
    sc.sql("INSERT INTO rcat.ns.t SELECT * FROM rst_src")
    sc.sql("DELETE FROM rcat.ns.t WHERE doc_id < 100") // DVs in the snapshot
    val tableDir = java.nio.file.Paths.get(root, "ns", "t").toString
    val vDv = graft.sources.DocStoreCommitOps.nextVersion(tableDir) - 1
    val wantRows = sc.sql("SELECT COUNT(*) FROM rcat.ns.t").collect()(0).getLong(0)

    sc.sql("DELETE FROM rcat.ns.t WHERE doc_id < 300") // further damage
    val restored = sc.sql(s"CALL rcat.system.restore('ns.t', $vDv)").collect()
    assert(restored(0).getLong(0) == vDv && restored(0).getLong(1) > vDv,
      "restore must publish a NEW version (history append-only)")
    // the DV'd snapshot content is back exactly — deletes < 100 apply,
    // deletes in [100, 300) are rolled back
    assert(sc.sql("SELECT COUNT(*) FROM rcat.ns.t").collect()(0).getLong(0)
      == wantRows)
    assert(sc.sql("SELECT COUNT(*) FROM rcat.ns.t WHERE doc_id < 100")
      .collect()(0).getLong(0) == 0, "restored snapshot must keep its DVs")
    // the damaged version is STILL readable: the restore was a commit
    assert(sc.sql(s"SELECT COUNT(*) FROM rcat.ns.t VERSION AS OF ${vDv + 1}")
      .collect()(0).getLong(0) < wantRows)

    // vacuum resets history → restoring a pre-vacuum version refuses
    sc.sql("CALL rcat.system.vacuum('ns.t')")
    val e = intercept[Exception] {
      sc.sql(s"CALL rcat.system.restore('ns.t', $vDv)").collect()
    }
    assert(e.getMessage.contains("MANIFEST.v") ||
      e.getMessage.contains("vacuum"), e.getMessage)
  }

  test("CDC stream: per-version batches, checkpointed restart reads only new commits") {
    import org.apache.spark.sql.streaming.Trigger
    val root = Files.createTempDirectory("docstore_cdc_stream").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.scat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.scat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .coalesce(1).createOrReplaceTempView("cdc_s_src")
    sc.sql("CREATE NAMESPACE scat.ns")
    sc.sql("CREATE TABLE scat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING) " +
      "TBLPROPERTIES ('graft.rowlevel.mode' = 'merge-on-read')")
    sc.sql("INSERT INTO scat.ns.t SELECT * FROM cdc_s_src WHERE doc_id < 200")
    sc.sql("DELETE FROM scat.ns.t WHERE doc_id < 50")
    val tableDir = java.nio.file.Paths.get(root, "ns", "t").toString
    val out = Files.createTempDirectory("cdc_sink")
    graft.core.Fs.deleteOnExit(out)
    val sink = out.resolve("data").toString
    val ckpt = out.resolve("ckpt").toString
    def drain(): Unit = {
      val q = sc.readStream.format("graft-docstore")
        .option("path", tableDir).option("readChangeFeed", "true").load()
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    drain()
    val r1 = sc.read.parquet(sink)
    // v1: 200 inserts; v2: 50 DV deletes — each tagged with its version
    assert(r1.filter(col("_change_type") === "insert").count() == 200)
    assert(r1.filter(col("_change_type") === "delete").count() == 50)
    assert(r1.select("_commit_version").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))

    // a new commit, same checkpoint: ONLY its rows are appended
    sc.sql("INSERT INTO scat.ns.t SELECT * FROM cdc_s_src " +
      "WHERE doc_id BETWEEN 200 AND 249")
    drain()
    val r2 = sc.read.parquet(sink)
    assert(r2.count() == 300, "restart must emit exactly the new commit")
    assert(r2.filter(col("_commit_version") === 3).count() == 50)

    // startingVersion is INCLUSIVE (Delta semantics): a fresh stream
    // from version 3 delivers version 3's changes in its first batch
    val out3 = Files.createTempDirectory("cdc_sink_sv")
    graft.core.Fs.deleteOnExit(out3)
    val q3 = sc.readStream.format("graft-docstore")
      .option("path", tableDir).option("readChangeFeed", "true")
      .option("startingVersion", "3").load()
      .writeStream.format("parquet")
      .option("path", out3.resolve("data").toString)
      .option("checkpointLocation", out3.resolve("ckpt").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q3.awaitTermination() finally q3.stop()
    val r3 = sc.read.parquet(out3.resolve("data").toString)
    assert(r3.count() == 50 &&
      r3.select("_commit_version").distinct().collect()
        .map(_.getLong(0)).toSeq == Seq(3L),
      "startingVersion must deliver its own version first (inclusive)")

    // startingVersion beyond the table head fails LOUDLY at stream
    // start (Delta behavior) — previously the paced offset could
    // regress below the request and silently stream earlier versions
    val out9 = Files.createTempDirectory("cdc_sink_hi")
    graft.core.Fs.deleteOnExit(out9)
    val e9 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q9 = sc.readStream.format("graft-docstore")
        .option("path", tableDir).option("readChangeFeed", "true")
        .option("startingVersion", "99").load()
        .writeStream.format("parquet")
        .option("path", out9.resolve("data").toString)
        .option("checkpointLocation", out9.resolve("ckpt").toString)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      try q9.awaitTermination() finally q9.stop()
    }
    assert(e9.getMessage.contains("beyond table head"), e9.getMessage)

    // BATCH CDF read (Delta's batch table_changes through the reader):
    // full history by default, windowed by startingVersion (inclusive)
    // / endingVersion — and option casing must not split schema/table
    // resolution (lowercase readchangefeed resolves the CDC table; the
    // pre-fix bug paired a CDC schema with a PLAIN table).
    val batchAll = sc.read.format("graft-docstore")
      .option("path", tableDir).option("readchangefeed", "true").load()
    assert(batchAll.columns.takeRight(2).toSeq ==
      Seq("_change_type", "_commit_version"))
    assert(batchAll.count() == 300, "full-history batch CDF = every change")
    val batchWin = sc.read.format("graft-docstore")
      .option("path", tableDir).option("readChangeFeed", "true")
      .option("startingVersion", "2").option("endingVersion", "2").load()
    assert(batchWin.count() == 50 &&
      batchWin.agg(max("_commit_version"), min("_commit_version"))
        .head.toSeq == Seq(2L, 2L),
      "versioned batch CDF window must cover exactly its commits")
    val eEnd = intercept[Exception] {
      sc.read.format("graft-docstore")
        .option("path", tableDir).option("readChangeFeed", "true")
        .option("endingVersion", "99").load().collect()
    }
    assert(eEnd.getMessage.contains("beyond table head"), eEnd.getMessage)
  }

  test("SHOW PARTITIONS lists manifest-derived identifiers; partial specs filter; verbs refuse") {
    val root = Files.createTempDirectory("docstore_showpart").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.pcat2" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.pcat2.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .createOrReplaceTempView("sp_src")
    sc.sql("CREATE NAMESPACE pcat2.ns")
    sc.sql("CREATE TABLE pcat2.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING) PARTITIONED BY (lang)")
    sc.sql("INSERT INTO pcat2.ns.t SELECT * FROM sp_src")
    val all = sc.sql("SHOW PARTITIONS pcat2.ns.t")
      .collect().map(_.getString(0)).sorted.toSeq
    val want = sc.sql("SELECT DISTINCT lang FROM sp_src")
      .collect().map(r => s"lang=${r.getString(0)}").sorted.toSeq
    assert(all == want, s"$all vs $want")
    // partial spec narrows to one identifier
    val one = sc.sql("SHOW PARTITIONS pcat2.ns.t PARTITION (lang='en')")
      .collect().map(_.getString(0)).toSeq
    assert(one == Seq("lang=en"))
    // aligned DELETE removes the partition from the listing (manifest
    // is the source of truth, not the directory tree)
    sc.sql("DELETE FROM pcat2.ns.t WHERE lang = 'de'")
    assert(!sc.sql("SHOW PARTITIONS pcat2.ns.t")
      .collect().map(_.getString(0)).contains("lang=de"))
    // bucket transform lists typed INT identifiers
    sc.sql("CREATE TABLE pcat2.ns.b (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING) PARTITIONED BY (bucket(4, doc_id))")
    sc.sql("INSERT INTO pcat2.ns.b SELECT * FROM sp_src")
    val buckets = sc.sql("SHOW PARTITIONS pcat2.ns.b")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(buckets == (0 to 3).map(i => s"doc_id_bucket=$i"))
    // Hive-style management verbs refuse with actionable messages
    val e = intercept[Exception] {
      sc.sql("ALTER TABLE pcat2.ns.t DROP PARTITION (lang='en')")
    }
    assert(e.getMessage.contains("DELETE WHERE"), e.getMessage)
    // SHOW PARTITIONS on an unpartitioned table raises (never an
    // empty list a tool would read as "no live partitions")
    sc.sql("CREATE TABLE pcat2.ns.u (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING)")
    sc.sql("INSERT INTO pcat2.ns.u SELECT * FROM sp_src WHERE doc_id < 10")
    val eu = intercept[Exception] {
      sc.sql("SHOW PARTITIONS pcat2.ns.u").collect()
    }
    assert(eu.getMessage.toLowerCase.contains("not partitioned"), eu.getMessage)
  }

  test("optimize: dataChange=false commit preserves history, compacts, and CDC skips it") {
    val root = Files.createTempDirectory("docstore_opt").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.ocat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.ocat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .coalesce(1).createOrReplaceTempView("opt_src")
    sc.sql("CREATE NAMESPACE ocat.ns")
    sc.sql("CREATE TABLE ocat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING)")
    // fragment: 4 commits, 2 segments each
    (0 until 4).foreach(i => sc.sql("INSERT INTO ocat.ns.t " +
      s"SELECT /*+ REPARTITION(2) */ * FROM opt_src " +
      s"WHERE doc_id % 4 = $i"))
    val tdir = java.nio.file.Paths.get(root, "ns", "t").toString
    val nSegsBefore = DocStore.readManifest(tdir).size
    assert(nSegsBefore >= 8, s"fixture must be fragmented, got $nSegsBefore")
    val vPre = graft.sources.DocStoreCommitOps.nextVersion(tdir) - 1

    val res = sc.sql("CALL ocat.system.optimize('ns.t', 3)").collect()
    assert(res.head.getLong(0) == nSegsBefore)
    val vOpt = res.head.getLong(2)
    assert(vOpt == vPre + 1, "optimize must be ONE new commit")
    val after = DocStore.readManifest(tdir)
    assert(after.size == 3, s"target 3, got ${after.size}")
    // the commit is flagged dataChange=false in the manifest itself
    assert(graft.sources.DocStoreCommitOps.isRewriteCommit(tdir, vOpt))
    assert(!graft.sources.DocStoreCommitOps.isRewriteCommit(tdir, vPre))
    // range layout: segments partition the doc_id space (no overlap)
    val sorted = after.sortBy(_.minId)
    sorted.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0).maxId < w(1).minId,
        s"range-compacted segments must not overlap: $sorted")
    }
    // history preserved: every prior manifest still on disk + readable
    (1L to vPre).foreach { v =>
      assert(Files.exists(java.nio.file.Paths.get(tdir, s"MANIFEST.v$v")))
    }
    assert(sc.sql(s"SELECT COUNT(*) FROM ocat.ns.t VERSION AS OF $vPre")
      .head.getLong(0) == 500)
    // content identical across the rewrite
    assert(sc.sql(s"SELECT COUNT(*), SUM(n_chars) FROM ocat.ns.t").head() ==
      sc.sql(s"SELECT COUNT(*), SUM(n_chars) FROM ocat.ns.t VERSION AS OF $vPre").head())
    // CDC: batch walk and stream face BOTH emit nothing for the commit
    assert(graft.sources.DocStoreCdf.changesBetween(sc, tdir, vPre, vOpt)
      .count() == 0, "CDF across a dataChange=false commit must be empty")
    // restore to a pre-compaction version still works (old segments kept)
    sc.sql(s"CALL ocat.system.restore('ns.t', 2)")
    assert(sc.sql("SELECT COUNT(*) FROM ocat.ns.t").head.getLong(0) ==
      sc.sql("SELECT COUNT(*) FROM ocat.ns.t VERSION AS OF 2").head.getLong(0))
    // no-op path: already at/below target → no new commit
    val head0 = graft.sources.DocStoreCommitOps.nextVersion(tdir) - 1
    sc.sql(s"CALL ocat.system.optimize('ns.t', 64)").collect()
    assert(graft.sources.DocStoreCommitOps.nextVersion(tdir) - 1 == head0,
      "optimize at/below target must not commit")
  }

  test("optimize on a partitioned table keeps partition directories and pruning") {
    val root = Files.createTempDirectory("docstore_opt_part").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.opcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.opcat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .coalesce(1).createOrReplaceTempView("optp_src")
    sc.sql("CREATE NAMESPACE opcat.ns")
    sc.sql("CREATE TABLE opcat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING) PARTITIONED BY (lang)")
    // fragment within partitions: 3 commits
    (0 until 3).foreach(i => sc.sql("INSERT INTO opcat.ns.t " +
      s"SELECT /*+ REPARTITION(2) */ * FROM optp_src WHERE doc_id % 3 = $i"))
    val tdir = java.nio.file.Paths.get(root, "ns", "t").toString
    val before = sc.sql("SELECT lang, COUNT(*) AS n FROM opcat.ns.t " +
      "GROUP BY lang ORDER BY lang").collect().toSeq
    sc.sql("CALL opcat.system.optimize('ns.t', 1)").collect()
    // every segment still lives under its lang=<v> directory — the
    // write path re-routed rows per partition during the rewrite
    val segs = DocStore.readManifest(tdir)
    assert(segs.forall(_.name.startsWith("lang=")),
      s"compacted segments must keep partition dirs: ${segs.map(_.name)}")
    // content identical, and SHOW PARTITIONS still manifest-derived
    assert(sc.sql("SELECT lang, COUNT(*) AS n FROM opcat.ns.t " +
      "GROUP BY lang ORDER BY lang").collect().toSeq == before)
    // directory pruning still fires on the compacted layout
    val plan = sc.sql("SELECT COUNT(*) FROM opcat.ns.t WHERE lang = 'en'")
      .queryExecution.executedPlan.toString
    val m = "segments=(\\d+)/(\\d+)".r.findFirstMatchIn(plan)
    assert(m.exists(x => x.group(1).toInt < x.group(2).toInt),
      s"partition pruning must skip non-en segments:\n$plan")
  }

  test("CDC across schema evolution: old commits read through the evolved schema") {
    val root = Files.createTempDirectory("docstore_cdc_evo").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.cecat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.cecat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .coalesce(1).createOrReplaceTempView("cevo_src")
    sc.sql("CREATE NAMESPACE cecat.ns")
    sc.sql("CREATE TABLE cecat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING)")
    sc.sql("INSERT INTO cecat.ns.t SELECT * FROM cevo_src WHERE doc_id < 100") // v1
    sc.sql("ALTER TABLE cecat.ns.t ADD COLUMN score BIGINT")
    sc.sql("INSERT INTO cecat.ns.t SELECT doc_id + 1000, n_chars, lang, " +
      "source, text, doc_id FROM cevo_src WHERE doc_id < 100")                 // v2
    val tdir = java.nio.file.Paths.get(root, "ns", "t").toString
    // batch CDF over the whole history reads v1's pre-evolution
    // segments through the CURRENT schema: score null-pads
    val ch = sc.read.format("graft-docstore")
      .option("path", tdir).option("readChangeFeed", "true").load()
    assert(ch.count() == 200)
    val v1s = ch.filter(col("_commit_version") === 1)
    assert(v1s.count() == 100 &&
      v1s.filter(col("score").isNotNull).count() == 0,
      "pre-evolution commits must null-pad the added column")
    val v2s = ch.filter(col("_commit_version") === 2)
    assert(v2s.filter(col("score").isNotNull).count() == 100)
  }

  test("expire_snapshots: retention window kept, old versions and their files reclaimed") {
    val root = Files.createTempDirectory("docstore_expire").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.xcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.xcat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .coalesce(1).createOrReplaceTempView("exp_src")
    sc.sql("CREATE NAMESPACE xcat.ns")
    sc.sql("CREATE TABLE xcat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING)")
    sc.sql("INSERT INTO xcat.ns.t SELECT * FROM exp_src WHERE doc_id < 100") // v1
    sc.sql("INSERT INTO xcat.ns.t SELECT * FROM exp_src " +
      "WHERE doc_id BETWEEN 100 AND 199")                                    // v2
    // CoW UPDATE rewrites every touched segment: the replaced files are
    // after this referenced ONLY by v1/v2 — the expire target
    sc.sql("UPDATE xcat.ns.t SET n_chars = n_chars + 1 WHERE doc_id >= 0")   // v3
    sc.sql("INSERT INTO xcat.ns.t SELECT * FROM exp_src " +
      "WHERE doc_id BETWEEN 200 AND 249")                                    // v4
    val tdir = java.nio.file.Paths.get(root, "ns", "t").toString
    val preCount = sc.sql("SELECT COUNT(*) FROM xcat.ns.t").head.getLong(0)
    def gdsOnDisk() = {
      val s = Files.walk(java.nio.file.Paths.get(tdir))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.count(_.getFileName.toString.endsWith(".gds"))
      } finally s.close()
    }
    val filesBefore = gdsOnDisk()
    val res = sc.sql("CALL xcat.system.expire_snapshots('ns.t', 2)").collect()
    assert(res.head.getLong(0) == 2, s"2 versions expired: ${res.toSeq}")
    assert(res.head.getLong(1) > 0 && res.head.getLong(2) > 0,
      "the CoW-replaced segments were referenced only by v1/v2 and must " +
        s"be reclaimed: ${res.toSeq}")
    assert(gdsOnDisk() < filesBefore)
    // the kept window still works end-to-end
    assert(!Files.exists(java.nio.file.Paths.get(tdir, "MANIFEST.v1")))
    assert(!Files.exists(java.nio.file.Paths.get(tdir, "MANIFEST.v2")))
    assert(Files.exists(java.nio.file.Paths.get(tdir, "MANIFEST.v3")))
    assert(sc.sql("SELECT COUNT(*) FROM xcat.ns.t").head.getLong(0) == preCount)
    assert(sc.sql("SELECT COUNT(*) FROM xcat.ns.t VERSION AS OF 4")
      .head.getLong(0) == preCount)
    // CDC inside the kept window works; crossing the expired edge
    // fails LOUDLY instead of skipping versions
    assert(graft.sources.DocStoreCdf.changesBetween(sc, tdir, 3, 4)
      .count() == 50)
    val eOld = intercept[Exception] { sc.sql(
      "SELECT COUNT(*) FROM xcat.ns.t VERSION AS OF 1").collect() }
    assert(eOld.getMessage.contains("does not exist"), eOld.getMessage)
    val eCdc = intercept[Exception] {
      graft.sources.DocStoreCdf.changesBetween(sc, tdir, 1, 4).count() }
    assert(eCdc.getMessage.contains("MANIFEST.v"), eCdc.getMessage)
    // at/below the window: no-op
    val res2 = sc.sql("CALL xcat.system.expire_snapshots('ns.t', 5)").collect()
    assert(res2.head.toSeq == Seq(0L, 0L, 0L))
  }

  test("drop column: metadata-only, section retired, re-add is a new identity") {
    val root = Files.createTempDirectory("docstore_drop").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.dcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.dcat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .coalesce(1).createOrReplaceTempView("drop_src")
    sc.sql("CREATE NAMESPACE dcat.ns")
    sc.sql("CREATE TABLE dcat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING)")
    sc.sql("INSERT INTO dcat.ns.t SELECT * FROM drop_src WHERE doc_id < 100")
    sc.sql("ALTER TABLE dcat.ns.t ADD COLUMN score BIGINT")
    sc.sql("INSERT INTO dcat.ns.t SELECT doc_id + 1000, n_chars, lang, " +
      "source, text, doc_id * 10 FROM drop_src WHERE doc_id < 100")
    val tdir = java.nio.file.Paths.get(root, "ns", "t").toString
    val filesBefore = DocStore.readManifest(tdir).map(_.name).sorted
    val sec1 = DocStore.sectionIds(DocStore.tableSchema(tdir)).last
    assert(sec1 == 5)

    sc.sql("ALTER TABLE dcat.ns.t DROP COLUMN score")
    // metadata-only: zero data files rewritten, schema back to base
    assert(DocStore.readManifest(tdir).map(_.name).sorted == filesBefore)
    assert(DocStore.tableSchema(tdir).fieldNames.toSeq ==
      Seq("doc_id", "n_chars", "lang", "source", "text"))
    assert(!sc.table("dcat.ns.t").columns.contains("score"))

    // re-ADD the same name: a NEW identity on a FRESH section — the old
    // bytes (doc_id*10) must be unreachable through it
    sc.sql("ALTER TABLE dcat.ns.t ADD COLUMN score BIGINT")
    val sec2 = DocStore.sectionIds(DocStore.tableSchema(tdir)).last
    assert(sec2 == 6, s"re-added column must get a fresh section, got $sec2")
    assert(DocStore.readManifest(tdir).map(_.name).sorted == filesBefore)
    val nulls = sc.sql("SELECT COUNT(*), COUNT(score) FROM dcat.ns.t").head()
    assert(nulls.getLong(0) == 200 && nulls.getLong(1) == 0,
      s"pre-re-add rows must read NULL score (old bytes retired): $nulls")
    // new writes land in the new section and read back
    sc.sql("INSERT INTO dcat.ns.t SELECT doc_id + 2000, n_chars, lang, " +
      "source, text, doc_id + 7 FROM drop_src WHERE doc_id < 50")
    val gen3 = sc.sql("SELECT COUNT(score), SUM(score) FROM dcat.ns.t").head()
    assert(gen3.getLong(0) == 50 &&
      gen3.getLong(1) == (0 until 50).map(_ + 7).sum)
    // base columns and partition columns refuse to drop
    val eb = intercept[Exception] {
      sc.sql("ALTER TABLE dcat.ns.t DROP COLUMN text") }
    assert(eb.getMessage.contains("base column"), eb.getMessage)
    // RESTORE across the ALTERs rolls the schema back with the data
    // (Delta metadata-restore semantics): version 1 was base-5
    sc.sql("CALL dcat.system.restore('ns.t', 1)").collect()
    assert(DocStore.tableSchema(tdir).fieldNames.toSeq ==
      Seq("doc_id", "n_chars", "lang", "source", "text"))
    assert(sc.sql("SELECT COUNT(*) FROM dcat.ns.t").head.getLong(0) == 100)
    assert(!sc.table("dcat.ns.t").columns.contains("score"))
  }

  private def plannedOf(df: DataFrame): (Int, Int) = {
    val m = "segments=(\\d+)/(\\d+)".r.findFirstMatchIn(physical(df)).get
    (m.group(1).toInt, m.group(2).toInt)
  }

  test("per-segment column stats: recorded at write, prune scans soundly") {
    val tmp = Files.createTempDirectory("docstore_stats").toString
    def slice(l: String) = docs.where(col("lang") === l).coalesce(1)
    Seq("fr", "en", "de").foreach(l => slice(l).write
      .format("graft-docstore").mode("append").option("path", tmp).save())
    val segs = DocStore.readManifest(tmp)
    assert(segs.size == 3)
    segs.foreach { s =>
      s.stats(2).bound match { // lang (section 2): one value per segment
        case Some(DocStore.StrBound(lo, hi)) => assert(lo == hi)
        case b => fail(s"expected a string envelope on lang, got $b")
      }
      assert(s.stats(2).nulls == 0)
      s.stats(1).bound match { // n_chars (section 1): long envelope
        case Some(DocStore.LongBound(lo, hi)) => assert(lo <= hi)
        case b => fail(s"expected a long envelope on n_chars, got $b")
      }
    }
    def readBack = spark.read.format("graft-docstore")
      .option("path", tmp).load()
    // string equality prunes to the single owning segment, row-exact
    val en = readBack.where(col("lang") === "en")
    assert(plannedOf(en) == ((1, 3)), physical(en))
    assert(en.orderBy("doc_id").collect().map(_.toSeq).toSeq ==
      docs.where(col("lang") === "en").orderBy("doc_id")
        .collect().map(_.toSeq).toSeq)
    // long envelope: a bound past the global max plans zero segments
    val mx = docs.agg(org.apache.spark.sql.functions.max("n_chars"))
      .head.getLong(0)
    assert(plannedOf(readBack.where(col("n_chars") > mx))._1 == 0)
    // null-count rules: IsNull prunes all (no nulls anywhere),
    // IsNotNull keeps all
    assert(plannedOf(readBack.where(col("lang").isNull))._1 == 0)
    assert(plannedOf(readBack.where(col("lang").isNotNull))._1 == 3)
    // disjunction keeps the union of its branches
    val or2 = readBack.where(col("lang") === "en" || col("lang") === "de")
    assert(plannedOf(or2)._1 == 2, physical(or2))
    // IN prunes to the named members' segments
    assert(plannedOf(readBack.where(col("lang").isin("de", "xx")))._1 == 1)
    // prefix pruning on the sorted envelope
    assert(plannedOf(readBack.where(col("lang").startsWith("e")))._1 == 1)
  }

  test("truncated string envelopes: long and non-ASCII values keep sound bounds") {
    import java.nio.charset.StandardCharsets.UTF_8
    // helper level: the prefix cut lands on a code-point boundary even
    // when byte 16 falls inside a multi-byte character
    val straddle = "a" * 15 + "日本語" // 15 + 3x3 bytes
    assert(new String(DocStore.truncLowerBytes(straddle.getBytes(UTF_8)),
      UTF_8) == "a" * 15)
    val hiS = new String(
      DocStore.truncUpperBytes(straddle.getBytes(UTF_8)).get, UTF_8)
    assert(DocStore.utf8Compare(hiS, straddle) > 0,
      s"upper bound '$hiS' must exceed the value")
    assert(hiS.getBytes(UTF_8).length <= DocStore.STR_BOUND_MAX + 3)
    // short values round-trip exactly
    assert(new String(DocStore.truncUpperBytes("short".getBytes(UTF_8)).get,
      UTF_8) == "short")
    // incrementing U+D7FF skips the surrogate block to U+E000
    val surr = "0123456789012\uD7FFxx" // 13 + 3 bytes = aligned 16
    assert(new String(DocStore.truncUpperBytes(surr.getBytes(UTF_8)).get,
      UTF_8) == "0123456789012\uE000")

    // write path: >64-byte partly non-ASCII values — the pre-r12
    // writer dropped these envelopes entirely; now they prune
    val tmp = Files.createTempDirectory("docstore_strstats").toString
    import spark.implicits._
    val aTxt = "alpha-日本語文書-" + ("x" * 80)
    val bTxt = "bravo-テキスト-" + ("y" * 80)
    Seq((1L, 5L, "xx", "s", aTxt), (2L, 6L, "xx", "s", bTxt)).foreach {
      case (id, n, l, src, t) =>
        Seq((id, n, l, src, t))
          .toDF("doc_id", "n_chars", "lang", "source", "text")
          .coalesce(1).write.format("graft-docstore").mode("append")
          .option("path", tmp).save()
    }
    val segs = DocStore.readManifest(tmp)
    assert(segs.size == 2 && segs.forall(
      _.stats(4).bound.exists(_.isInstanceOf[DocStore.StrBound])),
      s"text envelopes must survive long non-ASCII values: $segs")
    def rb = spark.read.format("graft-docstore").option("path", tmp).load()
    // equality prunes to the owning segment and stays row-exact
    val eq = rb.where(col("text") === bTxt)
    assert(plannedOf(eq) == ((1, 2)) && eq.count() == 1)
    // probes outside every envelope plan zero segments
    assert(plannedOf(rb.where(col("text") > "\uFFFF"))._1 == 0)
    assert(plannedOf(rb.where(col("text") < "a"))._1 == 0)
    // prefix pruning through the truncated bounds
    val pre = rb.where(col("text").startsWith("bravo"))
    assert(plannedOf(pre) == ((1, 2)) && pre.count() == 1)
    // a phantom value INSIDE segment A's inexact envelope (it shares
    // the full 16-byte prefix) is kept by planning — sound, never
    // wrong — and the residual row filter zeroes it
    val phantom = "alpha-日本語ZZZ"
    val pf = rb.where(col("text") === phantom)
    assert(plannedOf(pf)._1 == 1 && pf.count() == 0)
  }

  test("optimize cluster_by: stats envelopes become selective; z-order prunes both dims") {
    val root = Files.createTempDirectory("docstore_cluster").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.ccat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.ccat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .createOrReplaceTempView("cluster_src")
    sc.sql("CREATE NAMESPACE ccat.ns")
    sc.sql("CREATE TABLE ccat.ns.t (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING)")
    // interleaved inserts: every segment spans ~the full n_chars range,
    // so a selective n_chars filter cannot prune anything yet
    (0 until 4).foreach(i => sc.sql(
      s"INSERT INTO ccat.ns.t SELECT * FROM cluster_src WHERE doc_id % 4 = $i"))
    val cut = docs.stat.approxQuantile("n_chars", Array(0.25), 0.0)(0).toLong
    def q = sc.sql(s"SELECT * FROM ccat.ns.t WHERE n_chars <= $cut")
    val before = q.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(plannedOf(q) == ((4, 4)), physical(q))
    val tablePath = java.nio.file.Paths.get(root, "ns", "t").toString
    val v0 = graft.sources.DocStoreCommitOps.nextVersion(tablePath) - 1
    sc.sql("CALL ccat.system.optimize('ns.t', 4, 'n_chars')").collect()
    // a dataChange=false rewrite: history preserved, one new version
    val v1 = graft.sources.DocStoreCommitOps.nextVersion(tablePath) - 1
    assert(v1 == v0 + 1)
    assert(graft.sources.DocStoreCommitOps.isRewriteCommit(tablePath, v1))
    // clustered layout: the quartile filter now keeps ~1 of 4 segments
    assert(plannedOf(q)._1 < 4, physical(q))
    assert(q.orderBy("doc_id").collect().map(_.toSeq).toSeq == before)
    // 2-column z-order: a filter on EITHER dimension prunes
    sc.sql("CALL ccat.system.optimize('ns.t', 4, 'doc_id,n_chars')").collect()
    assert(plannedOf(q)._1 < 4, physical(q))
    assert(q.orderBy("doc_id").collect().map(_.toSeq).toSeq == before)
    // 3-column z-order (composed bit-arithmetic key): values intact,
    // and the n_chars envelopes visibly narrow vs the full range —
    // with only 4 output segments across 3 interleaved dimensions a
    // SPECIFIC filter's pruning is layout-dependent, but clustering
    // quality (sub-full-range envelopes) is what the key guarantees
    sc.sql("ALTER TABLE ccat.ns.t ADD COLUMN third BIGINT")
    sc.sql("UPDATE ccat.ns.t SET third = doc_id % 7")
    sc.sql("CALL ccat.system.optimize('ns.t', 4, 'doc_id,n_chars,third')")
      .collect()
    assert(q.orderBy("doc_id").collect().map(_.toSeq)
      .map(_.init).toSeq == before) // third appended at the end
    val tdir3 = java.nio.file.Paths.get(root, "ns", "t").toString
    val segs3 = DocStore.readManifest(tdir3)
    val widths = segs3.flatMap(_.stats.get(1)).flatMap(_.bound).collect {
      case DocStore.LongBound(lo, hi) => hi - lo }
    val global = docs.agg(max("n_chars").cast("long") -
      min("n_chars").cast("long")).head.getLong(0)
    assert(widths.nonEmpty && widths.min < (global * 9) / 10,
      s"3-col z-order must narrow some n_chars envelope: " +
        s"widths=$widths global=$global")
    // refusals: unknown column, arity
    assert(intercept[Exception] {
      sc.sql("CALL ccat.system.optimize('ns.t', 4, 'nope')").collect()
    }.getMessage.contains("cluster_by"))
    assert(intercept[Exception] {
      sc.sql("CALL ccat.system.optimize('ns.t', 4, 'a,b,c,d,e')").collect()
    }.getMessage.contains("at most 4"))
    // STRING members enter the z-order through the 7-byte-prefix
    // surrogate (r12): a (lang, source) layout must land and make the
    // lang envelopes selective — segments cover a sub-range of the
    // languages instead of all of them
    sc.sql("CALL ccat.system.optimize('ns.t', 6, 'lang,source')")
      .collect()
    val segsS = DocStore.readManifest(tdir3)
    val langBounds = segsS.flatMap(_.stats.get(2)).flatMap(_.bound)
      .collect { case DocStore.StrBound(lo, hi) => (lo, hi) }
    val globalLang = (docs.agg(min("lang")).head.getString(0),
      docs.agg(max("lang")).head.getString(0))
    assert(langBounds.nonEmpty && langBounds.exists(_ != globalLang),
      s"string z-order must narrow some lang envelope below the " +
        s"global $globalLang: $langBounds")
  }

  test("column DEFAULT + NOT NULL: analyzer fill, metadata-only backfill, write-time contract") {
    val root = Files.createTempDirectory("docstore_default").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.dcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.dcat.root" -> root)
    sc.sql("CREATE NAMESPACE dcat.ns")
    sc.sql("CREATE TABLE dcat.ns.t (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT NOT NULL, lang STRING DEFAULT 'und', " +
      "source STRING, text STRING)")
    // INSERT omitting a defaulted base column: the analyzer fills it
    sc.sql("INSERT INTO dcat.ns.t (doc_id, n_chars, source, text) " +
      "VALUES (1, 10, 's1', 'a')")
    assert(sc.sql("SELECT lang FROM dcat.ns.t").head.getString(0) == "und")
    // ADD COLUMN ... DEFAULT: pre-ADD segments read the default via
    // EXISTS_DEFAULT — metadata-only, no segment rewritten
    val segsBefore = DocStore.readManifest(
      java.nio.file.Paths.get(root, "ns", "t").toString).map(_.name)
    sc.sql("ALTER TABLE dcat.ns.t ADD COLUMN quality BIGINT DEFAULT 7")
    assert(DocStore.readManifest(java.nio.file.Paths.get(root, "ns", "t")
      .toString).map(_.name) == segsBefore, "backfill must not rewrite")
    assert(sc.sql("SELECT quality FROM dcat.ns.t").head.getLong(0) == 7)
    // CURRENT_DEFAULT governs later inserts; SET DEFAULT re-points it;
    // explicit NULL after the ADD stays null (exists vs current split)
    sc.sql("INSERT INTO dcat.ns.t (doc_id, n_chars, source, text) " +
      "VALUES (2, 20, 's2', 'b')")
    sc.sql("ALTER TABLE dcat.ns.t ALTER COLUMN quality SET DEFAULT 9")
    sc.sql("INSERT INTO dcat.ns.t (doc_id, n_chars, source, text) " +
      "VALUES (3, 30, 's3', 'c')")
    sc.sql("INSERT INTO dcat.ns.t VALUES (4, 40, 'xx', 's4', 'd', NULL)")
    sc.sql("ALTER TABLE dcat.ns.t ALTER COLUMN quality DROP DEFAULT")
    sc.sql("INSERT INTO dcat.ns.t (doc_id, n_chars, source, text) " +
      "VALUES (5, 50, 's5', 'e')")
    assert(sc.sql("SELECT doc_id, quality FROM dcat.ns.t ORDER BY doc_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq ==
      Seq((1L, 7L), (2L, 7L), (3L, 9L), (4L, -1L), (5L, -1L)))
    // NOT NULL from CREATE enforces on every write; the table is
    // untouched by the failed job
    intercept[Exception] {
      sc.sql("INSERT INTO dcat.ns.t VALUES (6, NULL, 'xx', 's', 't', 1)")
    }
    assert(sc.sql("SELECT COUNT(*) FROM dcat.ns.t").head.getLong(0) == 5)
    // ADD COLUMN NOT NULL needs a DEFAULT (old rows must read it)
    assert(intercept[Exception] {
      sc.sql("ALTER TABLE dcat.ns.t ADD COLUMN bad BIGINT NOT NULL")
    }.getMessage.contains("without a DEFAULT"))
    sc.sql("ALTER TABLE dcat.ns.t ADD COLUMN flag BIGINT NOT NULL DEFAULT 1")
    assert(sc.sql("SELECT SUM(flag) FROM dcat.ns.t").head.getLong(0) == 5)
    intercept[Exception] {
      sc.sql("INSERT INTO dcat.ns.t VALUES (7, 1, 'xx', 's', 't', 1, NULL)")
    }
    // SET NOT NULL programmatically (Spark's analyzer vetoes the SQL
    // form on v2 tables): refuse while nulls exist, land after
    // cleanup, then enforce on writes
    val cat = sc.sessionState.catalogManager.catalog("dcat")
      .asInstanceOf[graft.sources.DocStoreCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("ns"), "t")
    import org.apache.spark.sql.connector.catalog.TableChange
    assert(intercept[Exception] {
      cat.alterTable(ident,
        TableChange.updateColumnNullability(Array("quality"), false))
    }.getMessage.contains("existing rows hold nulls"))
    sc.sql("DELETE FROM dcat.ns.t WHERE quality IS NULL")
    cat.alterTable(ident,
      TableChange.updateColumnNullability(Array("quality"), false))
    intercept[Exception] {
      sc.sql("INSERT INTO dcat.ns.t VALUES (8, 1, 'xx', 's', 't', NULL, 1)")
    }
    // DROP NOT NULL re-admits nulls
    cat.alterTable(ident,
      TableChange.updateColumnNullability(Array("quality"), true))
    sc.sql("INSERT INTO dcat.ns.t VALUES (9, 1, 'xx', 's', 't', NULL, 1)")
    assert(sc.sql("SELECT COUNT(*) FROM dcat.ns.t").head.getLong(0) == 4)
  }

  test("generated columns: write-validated on every path, DDL refusals") {
    val root = Files.createTempDirectory("docstore_gen").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.gcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.gcat.root" -> root)
    sc.sql("CREATE NAMESPACE gcat.ns")
    sc.sql("CREATE TABLE gcat.ns.t (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT GENERATED ALWAYS AS (LENGTH(text)), lang STRING, " +
      "source STRING, text STRING)")
    sc.sql("INSERT INTO gcat.ns.t VALUES (1, 5, 'en', 's', 'hello')")
    // mismatched INSERT rejected (named constraint), table untouched
    def messages(t: Throwable): String =
      Iterator.iterate(t: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString("|")
    assert(messages(intercept[Exception] {
      sc.sql("INSERT INTO gcat.ns.t VALUES (2, 99, 'en', 's', 'x')")
    }).contains("GENERATED ALWAYS AS constraint on column 'n_chars'"))
    assert(sc.sql("SELECT COUNT(*) FROM gcat.ns.t").head.getLong(0) == 1)
    // UPDATE rewriting text without fixing the derived value rejects;
    // a consistent pair lands (CoW re-validates through the factory)
    intercept[Exception] {
      sc.sql("UPDATE gcat.ns.t SET text = 'longer' WHERE doc_id = 1")
    }
    sc.sql("UPDATE gcat.ns.t SET text = 'bye', n_chars = 3 WHERE doc_id = 1")
    assert(sc.sql("SELECT n_chars, text FROM gcat.ns.t").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((3L, "bye")))
    // DDL refusals: unresolvable expression; gen referencing gen
    intercept[Exception] {
      sc.sql("CREATE TABLE gcat.ns.bad (doc_id BIGINT NOT NULL, " +
        "n_chars BIGINT GENERATED ALWAYS AS (LENGTH(nope)), lang STRING, " +
        "source STRING, text STRING)")
    }
    intercept[Exception] {
      sc.sql("CREATE TABLE gcat.ns.bad2 (doc_id BIGINT NOT NULL, " +
        "n_chars BIGINT GENERATED ALWAYS AS (LENGTH(text)), lang STRING, " +
        "source STRING GENERATED ALWAYS AS (CAST(n_chars AS STRING)), " +
        "text STRING)")
    }
  }

  test("identity columns: striped assignment, watermark monotone, refusals") {
    val root = Files.createTempDirectory("docstore_ident").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.icat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.icat.root" -> root)
    sc.sql("CREATE NAMESPACE icat.ns")
    // BY DEFAULT + START/INCREMENT: assigned ids respect the spec,
    // explicit values are accepted and advance the watermark
    sc.sql("CREATE TABLE icat.ns.t (doc_id BIGINT GENERATED BY DEFAULT " +
      "AS IDENTITY (START WITH 100 INCREMENT BY 10), n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING)")
    sc.sql("INSERT INTO icat.ns.t (n_chars, lang, source, text) " +
      "VALUES (1, 'a', 's', 'x')")
    sc.sql("INSERT INTO icat.ns.t VALUES (500, 1, 'b', 's', 'y')")
    sc.sql("INSERT INTO icat.ns.t (n_chars, lang, source, text) " +
      "VALUES (1, 'c', 's', 'z')")
    assert(sc.sql("SELECT doc_id FROM icat.ns.t ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq == Seq(100L, 500L, 510L))
    // multi-row assignment: all unique, all past the watermark
    sc.sql("INSERT INTO icat.ns.t (n_chars, lang, source, text) " +
      "SELECT n_chars, lang, source, text FROM icat.ns.t")
    val ids = sc.sql("SELECT doc_id FROM icat.ns.t").collect()
      .map(_.getLong(0)).toSeq
    assert(ids.distinct.size == ids.size, s"identity collision: $ids")
    assert(ids.count(_ > 510) == 3, s"new ids must exceed the watermark: $ids")
    // watermark survives TRUNCATE — ids are never reused
    val before = ids.max
    sc.sql("TRUNCATE TABLE icat.ns.t")
    sc.sql("INSERT INTO icat.ns.t (n_chars, lang, source, text) " +
      "VALUES (1, 'd', 's', 'w')")
    val after = sc.sql("SELECT doc_id FROM icat.ns.t").head.getLong(0)
    assert(after > before,
      s"post-truncate id $after must exceed the pre-truncate max $before")
    // GENERATED ALWAYS refuses explicit; streaming sink refuses assignment
    sc.sql("CREATE TABLE icat.ns.strict (doc_id BIGINT GENERATED ALWAYS " +
      "AS IDENTITY, n_chars BIGINT, lang STRING, source STRING, text STRING)")
    def messages(t: Throwable): String =
      Iterator.iterate(t: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString("|")
    assert(messages(intercept[Exception] {
      sc.sql("INSERT INTO icat.ns.strict VALUES (1, 1, 'xx', 's', 't')")
    }).contains("GENERATED ALWAYS AS IDENTITY"))
    assert(sc.sql("SELECT COUNT(*) FROM icat.ns.strict").head.getLong(0) == 0)
    // identity is doc_id-only
    assert(intercept[Exception] {
      sc.sql("CREATE TABLE icat.ns.bad (doc_id BIGINT NOT NULL, " +
        "n_chars BIGINT GENERATED ALWAYS AS IDENTITY, lang STRING, " +
        "source STRING, text STRING)")
    }.getMessage.contains("doc_id"))
  }

  test("r12 review pins: negative-step identity, invalid-UTF-8 poison, MERGE watermark, clean CREATE refusal") {
    val root = Files.createTempDirectory("docstore_r12rev").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.rcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.rcat.root" -> root)
    sc.sql("CREATE NAMESPACE rcat.ns")
    // negative INCREMENT BY: values descend, the watermark moves DOWN,
    // and a second batch can never re-assign (the review found a
    // max-only advance that never moved for step < 0)
    sc.sql("CREATE TABLE rcat.ns.down (doc_id BIGINT GENERATED ALWAYS " +
      "AS IDENTITY (START WITH 0 INCREMENT BY -1), n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING)")
    sc.sql("INSERT INTO rcat.ns.down (n_chars, lang, source, text) " +
      "VALUES (1, 'a', 's', 'x'), (2, 'b', 's', 'y')")
    sc.sql("INSERT INTO rcat.ns.down (n_chars, lang, source, text) " +
      "VALUES (3, 'c', 's', 'z')")
    val downIds = sc.sql("SELECT doc_id FROM rcat.ns.down").collect()
      .map(_.getLong(0)).toSeq
    assert(downIds.distinct.size == 3 && downIds.forall(_ <= 0),
      s"negative-step identity must descend without reuse: $downIds")

    // invalid UTF-8 (CAST from BINARY) poisons the envelope — never a
    // mangled bound — and the segment stays un-prunable (sound)
    val tmp = Files.createTempDirectory("docstore_badutf8").toString
    sc.sql("SELECT CAST(1 AS BIGINT) AS doc_id, CAST(1 AS BIGINT) AS " +
      "n_chars, 'xx' AS lang, 's' AS source, " +
      "CAST(X'F5414243' AS STRING) AS text")
      .write.format("graft-docstore").mode("append")
      .option("path", tmp).save()
    val seg = DocStore.readManifest(tmp).head
    assert(seg.stats(4).bound.isEmpty,
      s"invalid UTF-8 must poison the text envelope: ${seg.stats(4)}")
    val probe = sc.read.format("graft-docstore").option("path", tmp)
      .load().where(col("text") > "�")
    assert(probe.count() == 1,
      "the 0xF5-leading value sorts above U+FFFD in binary order and " +
        "must survive planning (a mangled envelope would prune it)")

    // MERGE's explicit ids advance the identity watermark: later
    // assignment can never collide with merged rows
    sc.sql("CREATE TABLE rcat.ns.m (doc_id BIGINT GENERATED BY DEFAULT " +
      "AS IDENTITY, n_chars BIGINT, lang STRING, source STRING, text STRING)")
    sc.sql("INSERT INTO rcat.ns.m (n_chars, lang, source, text) " +
      "VALUES (1, 'a', 's', 'x')")
    sc.sql("SELECT CAST(10000 AS BIGINT) AS doc_id, CAST(9 AS BIGINT) AS " +
      "n_chars, 'mm' AS lang, 's' AS source, 't' AS text")
      .createOrReplaceTempView("m_src")
    sc.sql("MERGE INTO rcat.ns.m t USING m_src s ON t.doc_id = s.doc_id " +
      "WHEN NOT MATCHED THEN INSERT *")
    sc.sql("INSERT INTO rcat.ns.m (n_chars, lang, source, text) " +
      "VALUES (2, 'b', 's', 'y')")
    val mIds = sc.sql("SELECT doc_id FROM rcat.ns.m").collect()
      .map(_.getLong(0)).toSeq
    assert(mIds.distinct.size == 3 && mIds.exists(_ > 10000),
      s"post-MERGE assignment must land past the merged id: $mIds")

    // a refused CREATE is side-effect-free: the fixed-up retry lands
    intercept[Exception] {
      sc.sql("CREATE TABLE rcat.ns.g (doc_id BIGINT NOT NULL, " +
        "n_chars BIGINT GENERATED ALWAYS AS (LENGTH(nope)), lang STRING, " +
        "source STRING, text STRING)")
    }
    sc.sql("CREATE TABLE rcat.ns.g (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT GENERATED ALWAYS AS (LENGTH(text)), lang STRING, " +
      "source STRING, text STRING)")
    sc.sql("INSERT INTO rcat.ns.g VALUES (1, 2, 'a', 's', 'hi')")
    assert(sc.sql("SELECT COUNT(*) FROM rcat.ns.g").head.getLong(0) == 1)
  }

  test("change feed reads pre-ADD commits through exists-defaults") {
    val root = Files.createTempDirectory("docstore_cdf_def").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.fcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.fcat.root" -> root)
    sc.sql("CREATE NAMESPACE fcat.ns")
    sc.sql("CREATE TABLE fcat.ns.t (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING)")
    sc.sql("INSERT INTO fcat.ns.t VALUES (1, 10, 'aa', 's', 'x')")
    sc.sql("ALTER TABLE fcat.ns.t ADD COLUMN quality BIGINT DEFAULT 7")
    sc.sql("INSERT INTO fcat.ns.t VALUES (2, 20, 'bb', 's', 'y', 9)")
    val path = java.nio.file.Paths.get(root, "ns", "t").toString
    // the v1 insert's change rows read through the CURRENT schema, so
    // the added column surfaces its exists-default, not null — the
    // same contract batch reads have (reader-level backfill)
    val changes = graft.sources.DocStoreCdf.changesBetween(sc, path, 0, 2)
      .select(col("doc_id"), col("quality")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(changes == Map(1L -> 7L, 2L -> 9L),
      s"CDF must apply exists-defaults to pre-ADD commits: $changes")
  }

  test("CHECK constraints: every write path enforces, DDL validates, null passes") {
    val root = Files.createTempDirectory("docstore_check").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.kcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.kcat.root" -> root)
    sc.sql("CREATE NAMESPACE kcat.ns")
    // create-time constraint
    sc.sql("CREATE TABLE kcat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING) " +
      "TBLPROPERTIES ('graft.check.pos' = 'n_chars >= 0')")
    sc.sql("INSERT INTO kcat.ns.t VALUES (1, 10, 'en', 's', 'x')")
    def count() = sc.sql("SELECT COUNT(*) FROM kcat.ns.t").head.getLong(0)
    assert(count() == 1)
    // violation: job fails naming the constraint; table untouched
    val e1 = intercept[Exception] {
      sc.sql("INSERT INTO kcat.ns.t VALUES (2, -1, 'en', 's', 'x')") }
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString("|")
    assert(messages(e1).contains("CHECK constraint 'pos'"), messages(e1))
    assert(count() == 1)
    // SQL CHECK semantics: NULL passes
    sc.sql("INSERT INTO kcat.ns.t VALUES (3, NULL, 'en', 's', 'x')")
    assert(count() == 2)
    // ALTER SET adds a second constraint, enforced immediately
    sc.sql("ALTER TABLE kcat.ns.t SET TBLPROPERTIES " +
      "('graft.check.short' = 'n_chars < 1000')")
    val e2 = intercept[Exception] {
      sc.sql("INSERT INTO kcat.ns.t VALUES (4, 5000, 'en', 's', 'x')") }
    assert(messages(e2).contains("CHECK constraint 'short'"), messages(e2))
    // copy-on-write UPDATE rewrites flow through the same writer
    val e3 = intercept[Exception] {
      sc.sql("UPDATE kcat.ns.t SET n_chars = -7 WHERE doc_id = 1") }
    assert(messages(e3).contains("CHECK constraint 'pos'"), messages(e3))
    assert(sc.sql("SELECT n_chars FROM kcat.ns.t WHERE doc_id = 1")
      .head.getLong(0) == 10)
    // UNSET lifts it
    sc.sql("ALTER TABLE kcat.ns.t UNSET TBLPROPERTIES ('graft.check.short')")
    sc.sql("INSERT INTO kcat.ns.t VALUES (4, 5000, 'en', 's', 'x')")
    assert(count() == 3)
    // DDL-time validation: unknown column and unparseable SQL refuse
    assert(intercept[Exception] {
      sc.sql("ALTER TABLE kcat.ns.t SET TBLPROPERTIES " +
        "('graft.check.bad' = 'no_such_col > 0')")
    }.getMessage.contains("does not analyze"))
    assert(intercept[Exception] {
      sc.sql("CREATE TABLE kcat.ns.t2 (doc_id BIGINT NOT NULL, " +
        "n_chars BIGINT, lang STRING, source STRING, text STRING) " +
        "TBLPROPERTIES ('graft.check.bad' = 'NOT A ( PREDICATE')")
    }.getMessage.contains("does not analyze"))
    // the constraints surface through SHOW TBLPROPERTIES
    val props = sc.sql("SHOW TBLPROPERTIES kcat.ns.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.check.pos").contains("n_chars >= 0"), props)
    assert(!props.contains("graft.check.short"), props)
  }

  test("optimize small_bytes: bin-pack rewrites only the small tail, absorbs DVs") {
    val root = Files.createTempDirectory("docstore_binpack").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.bpcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.bpcat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .createOrReplaceTempView("bp_src")
    sc.sql("CREATE NAMESPACE bpcat.ns")
    sc.sql("CREATE TABLE bpcat.ns.t (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING) " +
      "TBLPROPERTIES ('graft.rowlevel.mode' = 'merge-on-read')")
    // three small segments + one big one
    Seq((0, 39), (40, 79), (80, 119), (120, 100000)).foreach { case (a, b) =>
      sc.sql("INSERT INTO bpcat.ns.t SELECT * FROM bp_src " +
        s"WHERE doc_id BETWEEN $a AND $b") }
    val tablePath = java.nio.file.Paths.get(root, "ns", "t").toString
    val seg0 = DocStore.readManifestAndDeletes(tablePath)
    assert(seg0._1.size == 4)
    val big = seg0._1.maxBy(_.bytes)
    val threshold = big.bytes // small tail = everything under the big one
    // a MoR DELETE inside one SMALL segment: its DV must be absorbed
    sc.sql("DELETE FROM bpcat.ns.t WHERE doc_id BETWEEN 0 AND 5")
    assert(DocStore.readDeletes(tablePath).nonEmpty)
    val expect = sc.sql("SELECT COUNT(*), SUM(n_chars) FROM bpcat.ns.t")
      .head.toSeq
    val r = sc.sql("CALL bpcat.system.optimize('ns.t', 8, '', " +
      s"$threshold)").head
    assert(r.getLong(0) == 3, r.toString) // the 3 small ones rewritten
    assert(r.getLong(1) == 1, r.toString) // packed into one
    val after = DocStore.readManifestAndDeletes(tablePath)
    // the big segment survives untouched, by name; DVs are gone
    assert(after._1.map(_.name).contains(big.name), after._1.map(_.name))
    assert(after._1.size == 2, after._1.map(_.name))
    assert(after._2.isEmpty)
    assert(graft.sources.DocStoreCommitOps.isRewriteCommit(tablePath,
      r.getLong(2)))
    assert(sc.sql("SELECT COUNT(*), SUM(n_chars) FROM bpcat.ns.t")
      .head.toSeq == expect)
    // steady state: a re-run finds nothing small enough to pack
    val r2 = sc.sql("CALL bpcat.system.optimize('ns.t', 8, '', " +
      s"$threshold)").head
    assert(r2.getLong(2) == r.getLong(2), r2.toString) // no new version
    // cluster_by + small_bytes refuse together
    assert(intercept[Exception] {
      sc.sql("CALL bpcat.system.optimize('ns.t', 8, 'n_chars', 1000)")
        .collect()
    }.getMessage.contains("full rewrite"))
  }

  test("metadata-only aggregates extend to stats-backed columns; gaps fall back") {
    lake
    // MIN/MAX/COUNT over n_chars answer EXACTLY from the per-segment
    // stats envelopes — zero segment IO, same as the doc_id zone map
    val agg = store.groupBy().agg(min("n_chars"), max("n_chars"),
      count("n_chars"), count(lit(1)))
    assert(physical(agg).contains("manifest-only"), physical(agg))
    val expect = docs.groupBy().agg(min("n_chars"), max("n_chars"),
      count("n_chars"), count(lit(1))).collect()(0).toSeq
    assert(agg.collect()(0).toSeq == expect)
    // string columns decline (envelopes can be poisoned by long or
    // non-ASCII values, so a fold is not guaranteed exact)
    val sAgg = store.groupBy().agg(min("lang"))
    assert(!physical(sAgg).contains("manifest-only"), physical(sAgg))
    assert(sAgg.collect()(0).getString(0) ==
      docs.groupBy().agg(min("lang")).collect()(0).getString(0))
    // a table with a stats-free segment (pre-stats writer) falls back
    // to the reading scan and stays correct
    val tmp = Files.createTempDirectory("docstore_agg_gap").toString
    docs.coalesce(1).write.format("graft-docstore")
      .option("path", tmp).mode("append").save()
    val mf = java.nio.file.Paths.get(tmp, "MANIFEST")
    import scala.jdk.CollectionConverters._
    val stripped = Files.readAllLines(mf).asScala
      .filterNot(_.startsWith("S,"))
    Files.write(mf, stripped.mkString("\n").getBytes("UTF-8"))
    val gap = spark.read.format("graft-docstore").option("path", tmp).load()
      .groupBy().agg(min("n_chars"), count("n_chars"))
    assert(!physical(gap).contains("manifest-only"), physical(gap))
    assert(gap.collect()(0).toSeq ==
      docs.groupBy().agg(min("n_chars"), count("n_chars"))
        .collect()(0).toSeq)
    // ...while COUNT(*) and the doc_id span still serve metadata-only
    val idAgg = spark.read.format("graft-docstore").option("path", tmp)
      .load().groupBy().agg(count(lit(1)), min("doc_id"))
    assert(physical(idAgg).contains("manifest-only"), physical(idAgg))
    // r13: the encoded 8-byte types serve typed MIN/MAX from the same
    // envelopes — the fold runs in encoded space (order-preserving) and
    // decodes at emit, negative doubles and DATE/BOOLEAN included
    val troot = Files.createTempDirectory("docstore_agg_typed").toString
    val tc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.aggt" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.aggt.root" -> troot)
    tc.sql("CREATE NAMESPACE aggt.ns")
    tc.sql("CREATE TABLE aggt.ns.t (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING, " +
      "price DOUBLE, born DATE, ok BOOLEAN, amt DECIMAL(10,2))")
    tc.sql("INSERT INTO aggt.ns.t VALUES " +
      "(1, 1, 'en', 's', 'a', -12.5D, DATE'2024-01-02', true, 3.50), " +
      "(2, 2, 'en', 's', 'b', 99.25D, DATE'2023-06-30', false, -1.25)")
    val typedAgg = tc.sql("SELECT MIN(price), MAX(price), MIN(born), " +
      "MAX(born), MIN(ok), MAX(ok), MIN(amt), MAX(amt) FROM aggt.ns.t")
    assert(physical(typedAgg).contains("manifest-only"),
      physical(typedAgg))
    val row = typedAgg.collect()(0)
    assert(row.getDouble(0) == -12.5 && row.getDouble(1) == 99.25)
    assert(row.getDate(2).toString == "2023-06-30" &&
      row.getDate(3).toString == "2024-01-02")
    assert(!row.getBoolean(4) && row.getBoolean(5))
    assert(row.getDecimal(6).toString == "-1.25" &&
      row.getDecimal(7).toString == "3.50")
  }

  test("plain stream startingVersion/startingTimestamp skip the backfill") {
    val tmp = Files.createTempDirectory("docstore_sv").toString
    def put(lang: String): Unit =
      docs.where(col("lang") === lang).coalesce(1).write
        .format("graft-docstore").option("path", tmp)
        .mode("append").save()
    put("fr"); put("en"); put("de") // v1, v2, v3
    val times = graft.sources.DocStoreCommitOps.versionTimes(tmp).toMap
    def streamed(opts: (String, String)*): Set[String] = {
      val out = Files.createTempDirectory("docstore_sv_out")
      graft.core.Fs.deleteOnExit(out)
      val r = opts.foldLeft(spark.readStream.format("graft-docstore")
        .option("path", tmp)) { case (b, (k, v)) => b.option(k, v) }
      val q = r.load().writeStream.format("parquet")
        .option("path", out.resolve("data").toString)
        .option("checkpointLocation", out.resolve("ckpt").toString)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      spark.read.parquet(out.resolve("data").toString)
        .select("lang").distinct().collect().map(_.getString(0)).toSet
    }
    // inclusive: version 2 delivers v2's and v3's segments, no v1
    assert(streamed("startingVersion" -> "2") == Set("en", "de"))
    // timestamp form: v3's commit instant resolves to v3
    assert(streamed("startingTimestamp" -> times(3L).toString) == Set("de"))
    // head+1 = only future commits: drains empty (sink dir may not
    // even materialize), then a later append would stream
    val out4 = Files.createTempDirectory("docstore_sv4")
    graft.core.Fs.deleteOnExit(out4)
    val q4 = spark.readStream.format("graft-docstore")
      .option("path", tmp).option("startingVersion", "4").load()
      .writeStream.format("parquet")
      .option("path", out4.resolve("data").toString)
      .option("checkpointLocation", out4.resolve("ckpt").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q4.awaitTermination() finally q4.stop()
    val dataDir = out4.resolve("data")
    assert(!Files.exists(dataDir) ||
      spark.read.parquet(dataDir.toString).isEmpty)
    // a query-side filter that PRUNES the v-1 tail segment must not
    // break the start position (skip-by-name-set, not resume-after):
    // startingVersion=2 + a 'de' filter prunes the fr and en segments
    // entirely — the stream still starts cleanly and emits v3's slice
    assert(streamed("startingVersion" -> "2") == Set("en", "de")) // sanity
    val outF = Files.createTempDirectory("docstore_svf")
    graft.core.Fs.deleteOnExit(outF)
    val qf = spark.readStream.format("graft-docstore")
      .option("path", tmp).option("startingVersion", "2").load()
      .where(col("lang") === "de")
      .writeStream.format("parquet")
      .option("path", outF.resolve("data").toString)
      .option("checkpointLocation", outF.resolve("ckpt").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try qf.awaitTermination() finally qf.stop()
    assert(spark.read.parquet(outF.resolve("data").toString)
      .select("lang").distinct().collect().map(_.getString(0)).toSet ==
      Set("de"))
    // a BATCH read refuses the streaming-only options
    assert(intercept[Exception] {
      spark.read.format("graft-docstore").option("path", tmp)
        .option("startingVersion", "2").load().count()
    }.getMessage.contains("STREAMING options"))
    // out-of-history bounds refuse loudly
    assert(intercept[Exception] { streamed("startingVersion" -> "9") }
      .getMessage.contains("outside the table history"))
  }

  test("restore across schema evolution rolls metadata back and is reversible") {
    val root = Files.createTempDirectory("docstore_rse").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.rscat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.rscat.root" -> root)
    sc.sql("CREATE NAMESPACE rscat.ns")
    sc.sql("CREATE TABLE rscat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING)")
    sc.sql("INSERT INTO rscat.ns.t VALUES (1, 10, 'en', 's', 'x')") // v1
    sc.sql("ALTER TABLE rscat.ns.t ADD COLUMN stars BIGINT") // since = 1
    sc.sql("INSERT INTO rscat.ns.t VALUES (2, 20, 'de', 's', 'y', 5)") // v2
    val tdir = java.nio.file.Paths.get(root, "ns", "t").toString
    def cols() = DocStore.tableSchema(tdir).fieldNames.toSeq
    assert(cols().contains("stars"))
    // back to v1: schema rolls back with the data
    sc.sql("CALL rscat.system.restore('ns.t', 1)").collect() // -> v3
    assert(!cols().contains("stars"))
    assert(sc.sql("SELECT * FROM rscat.ns.t").columns.length == 5)
    assert(sc.sql("SELECT COUNT(*) FROM rscat.ns.t").head.getLong(0) == 1)
    // reversible: restoring forward to v2 republishes the evolved
    // schema from the archive the first restore wrote
    sc.sql("CALL rscat.system.restore('ns.t', 2)").collect() // -> v4
    assert(cols().contains("stars"))
    assert(sc.sql("SELECT SUM(stars) FROM rscat.ns.t").head.getLong(0) == 5)
    assert(sc.sql("SELECT COUNT(*) FROM rscat.ns.t").head.getLong(0) == 2)
  }

  test("system.detail reports DV-adjusted metadata that matches SELECT") {
    val root = Files.createTempDirectory("docstore_detail").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.dtcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.dtcat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .coalesce(1).createOrReplaceTempView("dt_src")
    sc.sql("CREATE NAMESPACE dtcat.ns")
    sc.sql("CREATE TABLE dtcat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING) " +
      "TBLPROPERTIES ('graft.rowlevel.mode' = 'merge-on-read')")
    sc.sql("INSERT INTO dtcat.ns.t SELECT * FROM dt_src")
    sc.sql("DELETE FROM dtcat.ns.t WHERE doc_id < 25") // MoR: DVs, rows stay
    val d = sc.sql("CALL dtcat.system.detail('ns.t')").head
    assert(d.getString(0) == "graft-docstore")
    val live = sc.sql("SELECT COUNT(*) FROM dtcat.ns.t").head.getLong(0)
    assert(d.getLong(2) == live, s"detail n_rows ${d.getLong(2)} != $live")
    assert(d.getLong(1) > 0 && d.getLong(3) > 0)
    assert(d.getLong(4) == 2 && d.getLong(5) == 2) // head v2, 2 retained
    assert(d.getString(6) == "") // unpartitioned
    assert(d.getString(7).contains("graft.rowlevel.mode=merge-on-read"))
    // a partitioned table reports its transform spec
    sc.sql("CREATE TABLE dtcat.ns.p (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING) " +
      "PARTITIONED BY (lang, bucket(4, doc_id))")
    sc.sql("INSERT INTO dtcat.ns.p SELECT * FROM dt_src")
    val dp = sc.sql("CALL dtcat.system.detail('ns.p')").head
    assert(dp.getString(6) == "lang,bucket(4, doc_id)", dp.getString(6))
    assert(dp.getLong(2) == 500)
  }

  test("clone: zero-copy snapshot with its own history; divergence stays isolated") {
    val root = Files.createTempDirectory("docstore_clone").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.clcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.clcat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .coalesce(1).createOrReplaceTempView("cl_src")
    sc.sql("CREATE NAMESPACE clcat.ns")
    sc.sql("CREATE TABLE clcat.ns.src (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING) " +
      "TBLPROPERTIES ('graft.rowlevel.mode' = 'merge-on-read')")
    sc.sql("INSERT INTO clcat.ns.src SELECT * FROM cl_src")
    sc.sql("DELETE FROM clcat.ns.src WHERE doc_id < 20") // DVs ride along
    val r = sc.sql("CALL clcat.system.clone('ns.src', 'ns.dst')").head
    assert(r.getLong(0) > 0 && r.getBoolean(2), r.toString) // hard-linked
    // identical content, DVs included
    assert(sc.sql("SELECT COUNT(*), SUM(n_chars) FROM clcat.ns.dst")
      .head.toSeq ==
      sc.sql("SELECT COUNT(*), SUM(n_chars) FROM clcat.ns.src").head.toSeq)
    // divergence is isolated in BOTH directions
    sc.sql("DELETE FROM clcat.ns.dst WHERE lang = 'de'")
    sc.sql("INSERT INTO clcat.ns.src SELECT doc_id + 90000, n_chars, lang, " +
      "source, text FROM cl_src WHERE doc_id < 10")
    val srcN = sc.sql("SELECT COUNT(*) FROM clcat.ns.src").head.getLong(0)
    val dstN = sc.sql("SELECT COUNT(*) FROM clcat.ns.dst").head.getLong(0)
    assert(srcN == 480 + 10 && dstN == 480 - docs
      .where(col("lang") === "de" && col("doc_id") >= 20).count())
    // the clone has its OWN history (v1) and no inherited txns
    val dstDir = java.nio.file.Paths.get(root, "ns", "dst").toString
    assert(graft.sources.DocStoreCommitOps.versionTimes(dstDir)
      .map(_._1).headOption.contains(1L))
    assert(DocStore.readTxns(dstDir).isEmpty)
    // vacuum on the clone unlinks only its own entries: source intact
    sc.sql("CALL clcat.system.vacuum('ns.dst')")
    assert(sc.sql("SELECT COUNT(*) FROM clcat.ns.src").head.getLong(0)
      == srcN)
    // an existing target refuses
    assert(intercept[Exception] {
      sc.sql("CALL clcat.system.clone('ns.src', 'ns.dst')").collect()
    }.getMessage.contains("already exists"))
    // CLONE ... VERSION AS OF: v1 predates the DELETE and the insert
    sc.sql("CALL clcat.system.clone('ns.src', 'ns.v1', 1)").collect()
    assert(sc.sql("SELECT COUNT(*) FROM clcat.ns.v1").head.getLong(0) == 500)
    // a missing snapshot refuses
    assert(intercept[Exception] {
      sc.sql("CALL clcat.system.clone('ns.src', 'ns.v9', 99)").collect()
    }.getMessage.contains("no retained snapshot"))
    // a versioned clone BEHIND a schema change republishes the schema
    // that served the version (restore's archive machinery) — never
    // old segments under the newer schema
    val preAlterHead = graft.sources.DocStoreCommitOps.nextVersion(
      java.nio.file.Paths.get(root, "ns", "src").toString) - 1
    sc.sql("ALTER TABLE clcat.ns.src ADD COLUMN stars BIGINT")
    sc.sql("CALL clcat.system.clone('ns.src', 'ns.old', " +
      s"$preAlterHead)").collect()
    assert(!sc.table("clcat.ns.old").columns.contains("stars"))
    // ...while a current-snapshot clone carries the evolved schema
    sc.sql("CALL clcat.system.clone('ns.src', 'ns.cur')").collect()
    assert(sc.table("clcat.ns.cur").columns.contains("stars"))
  }

  test("partition evolution: metadata-only spec change; OPTIMIZE migrates the layout") {
    val root = Files.createTempDirectory("docstore_pevo").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.pecat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.pecat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .createOrReplaceTempView("pe_src")
    sc.sql("CREATE NAMESPACE pecat.ns")
    sc.sql("CREATE TABLE pecat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING)")
    sc.sql("INSERT INTO pecat.ns.t SELECT /*+ REPARTITION(2) */ * FROM pe_src")
    val tdir = java.nio.file.Paths.get(root, "ns", "t").toString
    val before = DocStore.readManifest(tdir).map(_.name).sorted
    val r = sc.sql(
      "CALL pecat.system.set_partitioning('ns.t', 'lang')").head
    assert(r.getString(0) == "" && r.getString(1) == "lang")
    // metadata-only: not a byte of data moved
    assert(DocStore.readManifest(tdir).map(_.name).sorted == before)
    // new writes route by the NEW spec; old segments stay put (mixed)
    sc.sql("INSERT INTO pecat.ns.t SELECT doc_id + 100000, n_chars, lang, " +
      "source, text FROM pe_src WHERE lang = 'zh'")
    val mixed = DocStore.readManifest(tdir).map(_.name)
    assert(mixed.exists(_.startsWith("lang=")) &&
      mixed.exists(!_.contains("/")), mixed)
    // reads stay exact across the mixed layout
    val nZh = sc.sql("SELECT COUNT(*) FROM pecat.ns.t WHERE lang = 'zh'")
      .head.getLong(0)
    assert(nZh == 2 * docs.where(col("lang") === "zh").count())
    assert(sc.sql("SELECT COUNT(*) FROM pecat.ns.t").head.getLong(0) ==
      500 + docs.where(col("lang") === "zh").count())
    // a full-rewrite OPTIMIZE migrates everything to the current spec
    sc.sql("CALL pecat.system.optimize('ns.t', 2)").collect()
    val migrated = DocStore.readManifest(tdir).map(_.name)
    assert(migrated.forall(_.startsWith("lang=")), migrated)
    // ...and directory pruning now fires on the whole table
    val de = sc.sql("SELECT * FROM pecat.ns.t WHERE lang = 'de'")
    val m = "segments=(\\d+)/(\\d+)".r.findFirstMatchIn(physical(de)).get
    assert(m.group(1).toInt < m.group(2).toInt, physical(de))
    // unpartition again: metadata-only, reads intact
    sc.sql("CALL pecat.system.set_partitioning('ns.t', '')").collect()
    assert(sc.sql("SELECT COUNT(*) FROM pecat.ns.t").head.getLong(0) ==
      500 + docs.where(col("lang") === "zh").count())
    // refusals: merge-on-read tables stay unpartitioned; unknown column
    sc.sql("CREATE TABLE pecat.ns.m (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING) " +
      "TBLPROPERTIES ('graft.rowlevel.mode' = 'merge-on-read')")
    assert(intercept[Exception] {
      sc.sql("CALL pecat.system.set_partitioning('ns.m', 'lang')").collect()
    }.getMessage.contains("merge-on-read"))
    assert(intercept[Exception] {
      sc.sql("CALL pecat.system.set_partitioning('ns.t', 'nope')").collect()
    }.getMessage.contains("not in the table schema"))
    // bucket(0) refuses through the SAME validator as CREATE TABLE
    assert(intercept[Exception] {
      sc.sql("CALL pecat.system.set_partitioning('ns.t', " +
        "'bucket(0, doc_id)')").collect()
    }.getMessage.contains("positive"))
    // changing the bucket COUNT over bucket-laid-out segments refuses:
    // `doc_id_bucket=<b>` dirs do not encode the modulus, so the new
    // spec would silently mis-prune and poison SPJ key grouping
    sc.sql("CREATE TABLE pecat.ns.b (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING) " +
      "PARTITIONED BY (bucket(4, doc_id))")
    sc.sql("INSERT INTO pecat.ns.b SELECT * FROM pe_src WHERE doc_id < 50")
    assert(intercept[Exception] {
      sc.sql("CALL pecat.system.set_partitioning('ns.b', " +
        "'bucket(8, doc_id)')").collect()
    }.getMessage.contains("bucket count"))
    // ...but the SAME bucket spec is a no-op-safe re-set
    sc.sql("CALL pecat.system.set_partitioning('ns.b', " +
      "'bucket(4, doc_id)')").collect()
    assert(sc.sql("SELECT COUNT(*) FROM pecat.ns.b WHERE doc_id = 7")
      .head.getLong(0) == 1)
  }

  test("branch publish carries idempotent txn versions to main") {
    val root = Files.createTempDirectory("docstore_btxn").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.btcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.btcat.root" -> root)
    sc.sql("CREATE NAMESPACE btcat.ns")
    sc.sql("CREATE TABLE btcat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING)")
    sc.sql("CALL btcat.system.create_branch('ns.t', 'stage')")
    val w = graft.core.Sessions.scoped(sc, "spark.graft.wap.branch" -> "stage")
    def data(s: org.apache.spark.sql.SparkSession) =
      s.range(1, 4).select(col("id").as("doc_id"),
        (col("id") * 10).as("n_chars"), lit("en").as("lang"),
        lit("s").as("source"), lit("x").as("text"))
    data(w).writeTo("btcat.ns.t")
      .option("txnAppId", "etl").option("txnVersion", "7").append()
    sc.sql("CALL btcat.system.publish_branch('ns.t', 'stage')")
    val tdir = java.nio.file.Paths.get(root, "ns", "t").toString
    // the branch-staged txn survives the fast-forward...
    assert(DocStore.readTxns(tdir) == Map("etl" -> 7L))
    // ...so a post-publish retry of the same (app, version) is a no-op
    data(sc).writeTo("btcat.ns.t")
      .option("txnAppId", "etl").option("txnVersion", "7").append()
    assert(sc.sql("SELECT COUNT(*) FROM btcat.ns.t").head.getLong(0) == 3)
  }

  test("history reset clears the restore schema stamp; new-era restores work") {
    val root = Files.createTempDirectory("docstore_stamp").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.stcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.stcat.root" -> root)
    sc.sql("CREATE NAMESPACE stcat.ns")
    sc.sql("CREATE TABLE stcat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING)")
    sc.sql("INSERT INTO stcat.ns.t VALUES (1, 10, 'en', 's', 'x')")
    sc.sql("ALTER TABLE stcat.ns.t ADD COLUMN stars BIGINT") // stamps since=1
    sc.sql("INSERT INTO stcat.ns.t VALUES (2, 20, 'de', 's', 'y', 5)")
    sc.sql("CALL stcat.system.vacuum('ns.t')") // history reset -> v1 only
    sc.sql("INSERT INTO stcat.ns.t VALUES (3, 30, 'fr', 's', 'z', 6)") // v2
    // the new era contains no schema change: restore must not be
    // blocked by the pre-reset stamp (whose numbering no longer exists)
    sc.sql("CALL stcat.system.restore('ns.t', 1)").collect()
    assert(sc.sql("SELECT COUNT(*) FROM stcat.ns.t").head.getLong(0) == 2)
  }

  test("existing rows must satisfy a newly added CHECK constraint") {
    val root = Files.createTempDirectory("docstore_precheck").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.pccat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.pccat.root" -> root)
    sc.sql("CREATE NAMESPACE pccat.ns")
    sc.sql("CREATE TABLE pccat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING)")
    sc.sql("INSERT INTO pccat.ns.t VALUES (1, -5, 'en', 's', 'x')")
    // the legacy row violates: ADD CONSTRAINT scans and refuses —
    // accepting it would brick every later rewrite (Delta refuses too)
    val e = intercept[Exception] {
      sc.sql("ALTER TABLE pccat.ns.t SET TBLPROPERTIES " +
        "('graft.check.nonneg' = 'n_chars >= 0')") }
    assert(e.getMessage.contains("existing rows violate"), e.getMessage)
    // nothing was persisted; after fixing the row the constraint lands
    sc.sql("UPDATE pccat.ns.t SET n_chars = 5 WHERE doc_id = 1")
    sc.sql("ALTER TABLE pccat.ns.t SET TBLPROPERTIES " +
      "('graft.check.nonneg' = 'n_chars >= 0')")
    assert(intercept[Exception] {
      sc.sql("INSERT INTO pccat.ns.t VALUES (2, -1, 'en', 's', 'x')")
    } != null)
  }

  test("expire_snapshots older_than: time-based retention with a keep_last floor") {
    val root = Files.createTempDirectory("docstore_older").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.otcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.otcat.root" -> root)
    sc.sql("CREATE NAMESPACE otcat.ns")
    sc.sql("CREATE TABLE otcat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING)")
    (1 to 5).foreach(i => sc.sql(
      s"INSERT INTO otcat.ns.t VALUES ($i, ${i * 10}, 'en', 's', 'x')"))
    val tdir = java.nio.file.Paths.get(root, "ns", "t").toString
    val times = graft.sources.DocStoreCommitOps.versionTimes(tdir).toMap
    // cut between v3 and v4: v1-v3 are older, but keep_last=3 floors
    // the newest three, so only v1 and v2 actually expire
    val cut = times(4L)
    val r = sc.sql("CALL otcat.system.expire_snapshots('ns.t', 3, " +
      s"'$cut')").head
    assert(r.getLong(0) == 2, r.toString)
    assert(graft.sources.DocStoreCommitOps.versionTimes(tdir)
      .map(_._1) == Seq(3L, 4L, 5L))
    // the ISO form resolves identically (everything older than cut is
    // already gone, so this expires nothing)
    val r2 = sc.sql("CALL otcat.system.expire_snapshots('ns.t', 1, " +
      s"'${java.time.Instant.ofEpochMilli(cut)}')").head
    assert(r2.getLong(0) == 1, r2.toString) // v3 (< cut, above the floor now)
    assert(sc.sql("SELECT COUNT(*) FROM otcat.ns.t").head.getLong(0) == 5)
  }

  test("_commit_version lineage column maps rows to their ingest commit") {
    val root = Files.createTempDirectory("docstore_lineage").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.lncat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.lncat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .coalesce(1).createOrReplaceTempView("ln_src")
    sc.sql("CREATE NAMESPACE lncat.ns")
    sc.sql("CREATE TABLE lncat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING)")
    Seq((0, 99), (100, 199), (200, 100000)).foreach { case (a, b) =>
      sc.sql(s"INSERT INTO lncat.ns.t SELECT * FROM ln_src " +
        s"WHERE doc_id BETWEEN $a AND $b") }
    // each insert slice carries its commit's version
    val byV = sc.sql("SELECT _commit_version, COUNT(*), MIN(doc_id), " +
      "MAX(doc_id) FROM lncat.ns.t GROUP BY 1 ORDER BY 1").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(byV.map(_._1).toSeq == Seq(1L, 2L, 3L), byV.toSeq)
    assert(byV(0)._3 <= 99 && byV(1)._2 >= 100 && byV(1)._3 <= 199)
    // a dataChange=false compaction REWRITES lineage to its own
    // version (the segments are new files born at the optimize commit)
    sc.sql("CALL lncat.system.optimize('ns.t', 1)").collect()
    val after = sc.sql("SELECT DISTINCT _commit_version FROM lncat.ns.t")
      .collect().map(_.getLong(0)).toSeq
    assert(after == Seq(4L), after)
    // branch-staged rows read null lineage (no published version yet)
    sc.sql("CALL lncat.system.create_branch('ns.t', 'wip')")
    val w = graft.core.Sessions.scoped(sc, "spark.graft.wap.branch" -> "wip")
    w.sql("INSERT INTO lncat.ns.t SELECT doc_id + 500000, n_chars, lang, " +
      "source, text FROM lncat.ns.t VERSION AS OF 4 WHERE doc_id < 10")
    val nulls = w.sql("SELECT COUNT(*) FROM lncat.ns.t " +
      "WHERE _commit_version IS NULL").head.getLong(0)
    assert(nulls == 10, s"branch-staged rows must read null lineage: $nulls")
    sc.sql("CALL lncat.system.drop_branch('ns.t', 'wip')")
  }

  test("metadata tables: t.files / t.history / t.partitions read as relations") {
    val root = Files.createTempDirectory("docstore_meta").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.mtcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.mtcat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .coalesce(1).createOrReplaceTempView("mt_src")
    sc.sql("CREATE NAMESPACE mtcat.ns")
    sc.sql("CREATE TABLE mtcat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING) PARTITIONED BY (lang) " +
      "TBLPROPERTIES ('graft.rowlevel.mode' = 'copy-on-write')")
    sc.sql("INSERT INTO mtcat.ns.t SELECT * FROM mt_src")
    sc.sql("INSERT INTO mtcat.ns.t SELECT doc_id + 10000, n_chars, lang, " +
      "source, text FROM mt_src WHERE lang = 'en'")
    // files: one row per live segment, composable SQL (aggregation)
    val files = sc.sql("SELECT SUM(n_rows), COUNT(*) FROM mtcat.ns.t.files")
      .head
    assert(files.getLong(0) ==
      sc.sql("SELECT COUNT(*) FROM mtcat.ns.t").head.getLong(0))
    assert(files.getLong(1) >= 5) // at least one segment per language
    // partition rollup matches a real GROUP BY on the data
    val parts = sc.sql("SELECT partition, n_rows FROM mtcat.ns.t.partitions " +
      "ORDER BY partition").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = sc.sql("SELECT lang, COUNT(*) FROM mtcat.ns.t GROUP BY lang")
      .collect().map(r => s"lang=${r.getString(0)}" -> r.getLong(1)).toMap
    assert(parts == byLang, s"$parts vs $byLang")
    // history: same facts as CALL system.history, as a relation
    val hist = sc.sql(
      "SELECT version, n_rows, is_current FROM mtcat.ns.t.history " +
        "ORDER BY version").collect().map(_.toSeq)
    val proc = sc.sql("CALL mtcat.system.history('ns.t')")
      .select("version", "n_rows", "is_current")
      .orderBy("version").collect().map(_.toSeq)
    assert(hist.toSeq == proc.toSeq)
    // an unknown suffix is still a missing table, not a meta table
    assert(intercept[Exception] {
      sc.sql("SELECT * FROM mtcat.ns.t.nope").collect()
    }.getMessage.toLowerCase.contains("cannot be found"))
    // partitions on an unpartitioned table refuses with a clear message
    sc.sql("CREATE TABLE mtcat.ns.u (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING)")
    sc.sql("INSERT INTO mtcat.ns.u SELECT * FROM mt_src LIMIT 10")
    assert(intercept[Exception] {
      sc.sql("SELECT * FROM mtcat.ns.u.partitions").collect()
    }.getMessage.contains("not partitioned"))
  }

  test("Bloom skipping: point predicates skip segments whose min/max envelopes cannot") {
    val root = Files.createTempDirectory("docstore_bloom").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.blcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.blcat.root" -> root)
    sc.sql("CREATE NAMESPACE blcat.ns")
    sc.sql("CREATE TABLE blcat.ns.t (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING) " +
      "TBLPROPERTIES ('graft.bloom.columns' = 'doc_id,source')")
    sc.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars"), col("lang"),
        md5(col("text")).as("source"), col("text"))
      .createOrReplaceTempView("bloom_src")
    // id-striped commits: every segment spans ~the full doc_id range
    // and its md5 'source' envelope spans ~the whole hex domain, so
    // the [lo, hi] stats keep everything — only the Bloom can skip
    (0 to 3).foreach(k => sc.sql("INSERT INTO blcat.ns.t " +
      s"SELECT * FROM bloom_src WHERE doc_id % 4 = $k"))
    def kept(df: DataFrame): (Int, Int) = {
      val m = "segments=(\\d+)/(\\d+)".r
        .findFirstMatchIn(physical(df)).getOrElse(
          fail(s"no segment count in plan:\n${physical(df)}"))
      (m.group(1).toInt, m.group(2).toInt)
    }
    // string probe: the md5 of one known document
    val fp = docs.where(col("doc_id") === 42)
      .select(md5(col("text"))).head().getString(0)
    val q1 = sc.sql(s"SELECT doc_id FROM blcat.ns.t WHERE source = '$fp'")
    val (k1, n1) = kept(q1)
    assert(n1 == 4 && k1 < n1,
      s"string bloom must skip segments, read $k1/$n1:\n${physical(q1)}")
    assert(q1.collect().map(_.getLong(0)).toSeq == Seq(42L))
    // long probe on the id itself: striping defeats the [minId, maxId]
    // zone map, the doc_id bloom carries the skip
    val q2 = sc.sql("SELECT source FROM blcat.ns.t WHERE doc_id = 123")
    val (k2, n2) = kept(q2)
    assert(k2 < n2, s"doc_id bloom must skip, read $k2/$n2")
    assert(q2.count() == 1)
    // definite absence: a value no segment folded — with fixed data the
    // kept count is deterministic; expect a full (or near-full) skip
    val q3 = sc.sql(
      "SELECT doc_id FROM blcat.ns.t WHERE source = 'not-a-real-hash'")
    val (k3, _) = kept(q3)
    assert(k3 <= 1, s"absent value should skip ~all segments, read $k3/4")
    assert(q3.count() == 0)
    // IN list across stripes: value-level disjunction keeps a segment
    // only when SOME listed value might be present
    val fp2 = docs.where(col("doc_id") === 43)
      .select(md5(col("text"))).head().getString(0)
    val q4 = sc.sql("SELECT doc_id FROM blcat.ns.t " +
      s"WHERE source IN ('$fp', '$fp2')")
    val (k4, n4) = kept(q4)
    assert(k4 < n4, s"IN bloom must skip, read $k4/$n4")
    assert(q4.collect().map(_.getLong(0)).sorted.toSeq == Seq(42L, 43L))
    // blooms survive a manifest round trip + carry forward across
    // commits (q1 above already proves parse; prove OPTIMIZE rewrite
    // regenerates them for the packed segments)
    sc.sql("CALL blcat.system.optimize('ns.t', 2)")
    val q5 = sc.sql(s"SELECT doc_id FROM blcat.ns.t WHERE source = '$fp'")
    val (k5, n5) = kept(q5)
    assert(n5 == 2 && k5 == 1,
      s"post-OPTIMIZE bloom must prune to the one id-range segment, " +
        s"read $k5/$n5:\n${physical(q5)}")
    assert(q5.collect().map(_.getLong(0)).toSeq == Seq(42L))
    // ineligible type and typo'd names refuse loudly AT DDL TIME
    // (CREATE / SET TBLPROPERTIES), never silently no-op
    sc.sql("CREATE TABLE blcat.ns.bad (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING)")
    sc.sql("ALTER TABLE blcat.ns.bad ADD COLUMNS (score DOUBLE)")
    val e = intercept[Exception] {
      sc.sql("ALTER TABLE blcat.ns.bad SET TBLPROPERTIES " +
        "('graft.bloom.columns' = 'score')")
    }
    assert(e.getMessage != null && (e.getMessage.contains("Bloom") ||
      Option(e.getCause).exists(_.getMessage.contains("Bloom"))),
      s"expected a loud Bloom eligibility refusal, got: $e")
    val e2 = intercept[Exception] {
      sc.sql("ALTER TABLE blcat.ns.bad SET TBLPROPERTIES " +
        "('graft.bloom.columns' = 'no_such_col')")
    }
    assert(e2.getMessage.contains("unknown column"),
      s"expected an unknown-column refusal, got: $e2")
    assert(intercept[Exception] {
      sc.sql("CREATE TABLE blcat.ns.bad2 (doc_id BIGINT NOT NULL, " +
        "n_chars BIGINT, lang STRING, source STRING, text STRING) " +
        "TBLPROPERTIES ('graft.bloom.columns' = 'typo')")
    }.getMessage.contains("unknown column"))
    // a Bloom-indexed column cannot be dropped or renamed out from
    // under its property — unset it first
    sc.sql("ALTER TABLE blcat.ns.bad ADD COLUMNS (fp STRING)")
    sc.sql("ALTER TABLE blcat.ns.bad SET TBLPROPERTIES " +
      "('graft.bloom.columns' = 'fp')")
    assert(intercept[Exception] {
      sc.sql("ALTER TABLE blcat.ns.bad DROP COLUMN fp")
    }.getMessage.contains("Bloom-indexed"))
    assert(intercept[Exception] {
      sc.sql("ALTER TABLE blcat.ns.bad RENAME COLUMN fp TO fp2")
    }.getMessage.contains("Bloom-indexed"))
    sc.sql("ALTER TABLE blcat.ns.bad UNSET TBLPROPERTIES " +
      "('graft.bloom.columns')")
    sc.sql("ALTER TABLE blcat.ns.bad DROP COLUMN fp") // now allowed
  }

  test("metadata-only DELETE generalizes past id windows: partition values and exact envelopes") {
    val root = Files.createTempDirectory("docstore_metadel").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.mdcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.mdcat.root" -> root)
    sc.sql("CREATE NAMESPACE mdcat.ns")
    // (a) identity-partitioned: DELETE WHERE lang = 'de' must drop the
    // partition's segments from the manifest without writing ANY file
    sc.sql("CREATE TABLE mdcat.ns.p (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING) " +
      "PARTITIONED BY (lang)")
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .createOrReplaceTempView("md_src")
    sc.sql("INSERT INTO mdcat.ns.p SELECT * FROM md_src")
    val pPath = java.nio.file.Paths.get(root, "ns", "p").toString
    def names(path: String): Set[String] =
      DocStore.readManifestAndDeletes(path)._1.map(_.name).toSet
    val before = names(pPath)
    val deCount = sc.sql(
      "SELECT COUNT(*) FROM md_src WHERE lang = 'de'").head().getLong(0)
    sc.sql("DELETE FROM mdcat.ns.p WHERE lang = 'de'")
    val after = names(pPath)
    assert(after.subsetOf(before),
      s"partition DELETE must write no segment: new = ${after -- before}")
    assert((before -- after).forall(_.startsWith("lang=de/")),
      s"only the de partition may drop: ${before -- after}")
    assert(sc.sql("SELECT COUNT(*) FROM mdcat.ns.p WHERE lang = 'de'")
      .head().getLong(0) == 0)
    assert(sc.sql("SELECT COUNT(*) FROM mdcat.ns.p").head().getLong(0)
      == 500 - deCount)
    // (b) range-clustered: a retention DELETE aligned to the exact
    // n_chars band envelopes drops whole segments metadata-only
    sc.sql("CREATE TABLE mdcat.ns.r (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING)")
    Seq("n_chars < 200", "n_chars BETWEEN 200 AND 399",
      "n_chars >= 400").foreach(band => sc.sql(
      "INSERT INTO mdcat.ns.r SELECT * FROM md_src " +
        s"WHERE n_chars IS NOT NULL AND $band"))
    val rPath = java.nio.file.Paths.get(root, "ns", "r").toString
    val rBefore = names(rPath)
    val rTotal = sc.sql("SELECT COUNT(*) FROM md_src " +
      "WHERE n_chars IS NOT NULL").head().getLong(0)
    val lowCount = sc.sql(
      "SELECT COUNT(*) FROM md_src WHERE n_chars < 400").head().getLong(0)
    sc.sql("DELETE FROM mdcat.ns.r WHERE n_chars < 400")
    val rAfter = names(rPath)
    assert(rAfter.subsetOf(rBefore),
      s"envelope DELETE must write no segment: new = ${rAfter -- rBefore}")
    assert((rBefore -- rAfter).nonEmpty && rAfter.nonEmpty,
      s"the low bands drop, the high band stays: ${rBefore -- rAfter}")
    assert(sc.sql("SELECT COUNT(*) FROM mdcat.ns.r").head().getLong(0)
      == rTotal - lowCount)
    // the dropped files are RETAINED for time travel
    assert(sc.sql("SELECT COUNT(*) FROM mdcat.ns.r VERSION AS OF 3")
      .head().getLong(0) == rTotal)
    // (c) a band-MISALIGNED predicate is ambiguous: falls back to the
    // exact rewrite (fresh segments appear), rows still exact
    val r2Before = names(rPath)
    sc.sql("DELETE FROM mdcat.ns.r WHERE n_chars >= 450")
    val r2After = names(rPath)
    assert((r2After -- r2Before).nonEmpty,
      "misaligned DELETE must route through the rewrite")
    assert(sc.sql("SELECT COUNT(*) FROM mdcat.ns.r").head().getLong(0)
      == sc.sql("SELECT COUNT(*) FROM md_src " +
        "WHERE n_chars >= 400 AND n_chars < 450").head().getLong(0))
  }

  test("Bloom filters survive INT -> BIGINT widening of the indexed column") {
    // the write path folds INT values AS LONGS, so a metadata-only
    // widening leaves every existing segment's filter probeable by
    // the (now BIGINT) literal — the docstring's claim, pinned
    val root = Files.createTempDirectory("docstore_bloom_widen").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.blw" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.blw.root" -> root)
    sc.sql("CREATE NAMESPACE blw.ns")
    sc.sql("CREATE TABLE blw.ns.t (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING)")
    sc.sql("ALTER TABLE blw.ns.t ADD COLUMNS (code INT)")
    sc.sql("ALTER TABLE blw.ns.t SET TBLPROPERTIES " +
      "('graft.bloom.columns' = 'code')")
    sc.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars"), col("lang"),
        col("source"), col("text"))
      .createOrReplaceTempView("blw_src")
    // striped: every segment's code envelope spans the same range
    (0 to 3).foreach(k => sc.sql("INSERT INTO blw.ns.t " +
      "SELECT *, CAST(doc_id * 7 + doc_id % 4 AS INT) FROM blw_src " +
      s"WHERE doc_id % 4 = $k"))
    sc.sql("ALTER TABLE blw.ns.t ALTER COLUMN code TYPE BIGINT")
    // probe a known pre-widening value with a BIGINT literal
    val q = sc.sql("SELECT doc_id FROM blw.ns.t WHERE code = " +
      (42L * 7 + 2).toString)
    val m = "segments=(\\d+)/(\\d+)".r
      .findFirstMatchIn(physical(q)).getOrElse(
        fail(s"no segment count in plan:\n${physical(q)}"))
    assert(m.group(2).toInt == 4 && m.group(1).toInt < 4,
      s"pre-widening blooms must still prune, read ${m.group(1)}/4")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(42L))
  }

  test("runtime join filtering prunes segments via Bloom filters on striped keys") {
    val root = Files.createTempDirectory("docstore_bloom_rt").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.blrt" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.blrt.root" -> root)
    sc.sql("CREATE NAMESPACE blrt.ns")
    sc.sql("CREATE TABLE blrt.ns.t (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING) " +
      "TBLPROPERTIES ('graft.bloom.columns' = 'source')")
    sc.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars"), col("lang"),
        md5(col("text")).as("source"), col("text"))
      .createOrReplaceTempView("blrt_src")
    (0 to 3).foreach(k => sc.sql("INSERT INTO blrt.ns.t " +
      s"SELECT * FROM blrt_src WHERE doc_id % 4 = $k"))
    // build side: fingerprints of two stripe-2 documents — the
    // striped StrBound envelopes all span the hex domain, so only
    // the runtime Bloom probes can narrow the scan
    val fps = sc.sql("SELECT DISTINCT source FROM blrt_src " +
      "WHERE doc_id IN (42, 46)").collect().map(_.getString(0))
    val expectSegs = sc.sql("SELECT COUNT(DISTINCT doc_id % 4) " +
      "FROM blrt_src WHERE source IN " +
      fps.map(f => s"'$f'").mkString("(", ",", ")")).head().getLong(0)
    val tablePath = java.nio.file.Paths.get(root, "ns", "t").toString
    val store = sc.read.format("graft-docstore")
      .option("path", tablePath).load()
    val dim = sc.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id").isin(42, 46))
      .select(md5(col("text")).as("dim_fp")).distinct()
    graft.sources.DocStoreScan.lastRuntimePlanned = -1
    val joined = store.join(broadcast(dim), col("source") === col("dim_fp"))
      .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
    val row = joined.collect()(0)
    val planned = graft.sources.DocStoreScan.lastRuntimePlanned
    assert(planned.toLong == expectSegs,
      s"runtime Bloom probes must keep exactly the $expectSegs " +
        s"stripe(s) holding the build-side keys, planned=$planned\n" +
        joined.queryExecution.executedPlan.toString)
    val expect = sc.sql("SELECT COUNT(*), SUM(n_chars) FROM blrt_src " +
      "WHERE source IN " +
      fps.map(f => s"'$f'").mkString("(", ",", ")")).collect()(0)
    assert(row.toSeq == expect.toSeq)
  }

  test("analyze backfills Bloom filters onto pre-property segments without a rewrite") {
    val root = Files.createTempDirectory("docstore_bloom_bf").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.blbf" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.blbf.root" -> root)
    sc.sql("CREATE NAMESPACE blbf.ns")
    // NO bloom property at write time — striped segments carry none
    sc.sql("CREATE TABLE blbf.ns.t (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING)")
    sc.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars"), col("lang"),
        md5(col("text")).as("source"), col("text"))
      .createOrReplaceTempView("blbf_src")
    (0 to 3).foreach(k => sc.sql("INSERT INTO blbf.ns.t " +
      s"SELECT * FROM blbf_src WHERE doc_id % 4 = $k"))
    val fp = sc.sql(
      "SELECT source FROM blbf_src WHERE doc_id = 42").head().getString(0)
    def keptOf(df: DataFrame): (Int, Int) = {
      val m = "segments=(\\d+)/(\\d+)".r
        .findFirstMatchIn(physical(df)).getOrElse(
          fail(s"no segment count in plan:\n${physical(df)}"))
      (m.group(1).toInt, m.group(2).toInt)
    }
    def probe = sc.sql(
      s"SELECT doc_id FROM blbf.ns.t WHERE source = '$fp'")
    // before: the property lands, but old segments have no filters —
    // the point query honestly reads everything
    sc.sql("ALTER TABLE blbf.ns.t SET TBLPROPERTIES " +
      "('graft.bloom.columns' = 'doc_id,source')")
    val (k0, n0) = keptOf(probe)
    assert(n0 == 4 && k0 == 4,
      s"pre-analyze segments carry no blooms; expected 4/4, got $k0/$n0")
    val tablePath = java.nio.file.Paths.get(root, "ns", "t").toString
    val namesBefore =
      DocStore.readManifestAndDeletes(tablePath)._1.map(_.name).toSet
    // the backfill: one distributed fold + one metadata-only commit
    sc.sql("CALL blbf.system.analyze('ns.t')")
    assert(DocStore.readManifestAndDeletes(tablePath)._1
      .map(_.name).toSet == namesBefore,
      "analyze must backfill metadata only — no segment rewritten")
    val (k1, n1) = keptOf(probe)
    assert(n1 == 4 && k1 < 4,
      s"post-analyze blooms must skip striped segments, got $k1/$n1")
    assert(probe.collect().map(_.getLong(0)).toSeq == Seq(42L))
    // long probe through the backfilled doc_id filter
    val q2 = sc.sql("SELECT source FROM blbf.ns.t WHERE doc_id = 123")
    val (k2, _) = keptOf(q2)
    assert(k2 < 4, s"backfilled doc_id bloom must skip, read $k2/4")
    assert(q2.count() == 1)
  }

  test("row-level DML group pruning consults stats + Bloom: only provably-matching segments rewrite") {
    val root = Files.createTempDirectory("docstore_bloom_dml").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.bldml" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.bldml.root" -> root)
    sc.sql("CREATE NAMESPACE bldml.ns")
    sc.sql("CREATE TABLE bldml.ns.t (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING) " +
      "TBLPROPERTIES ('graft.bloom.columns' = 'doc_id,source')")
    sc.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars"), col("lang"),
        md5(col("text")).as("source"), col("text"))
      .createOrReplaceTempView("bldml_src")
    (0 to 3).foreach(k => sc.sql("INSERT INTO bldml.ns.t " +
      s"SELECT * FROM bldml_src WHERE doc_id % 4 = $k"))
    val tablePath = java.nio.file.Paths.get(root, "ns", "t").toString
    def segNames: Set[String] =
      DocStore.readManifestAndDeletes(tablePath)._1.map(_.name).toSet
    // STATIC prune — a misaligned DELETE by fingerprint: every
    // stripe's StrBound envelope spans the hex domain, so only the
    // Bloom proves three of them matchless; the rewrite must replace
    // exactly the stripes that hold copies of that text
    val fp = sc.sql(
      "SELECT source FROM bldml_src WHERE doc_id = 42").head().getString(0)
    val stripesWithFp = sc.sql("SELECT COUNT(DISTINCT doc_id % 4) " +
      s"FROM bldml_src WHERE source = '$fp'").head().getLong(0)
    val before1 = segNames
    sc.sql(s"DELETE FROM bldml.ns.t WHERE source = '$fp'")
    val replaced1 = before1 -- segNames
    assert(replaced1.size.toLong == stripesWithFp,
      s"DELETE by fingerprint must rewrite only the $stripesWithFp " +
        s"stripe(s) holding it, rewrote ${replaced1.size}: $replaced1")
    assert(sc.sql("SELECT COUNT(*) FROM bldml.ns.t " +
      s"WHERE source = '$fp'").head().getLong(0) == 0)
    // RUNTIME prune — a MERGE keyed on doc_id with all source ids in
    // ONE stripe: the id-striped [minId, maxId] zone maps all overlap
    // (range narrowing keeps everything), so the doc_id Bloom carries
    // the runtime group-filter narrowing to the one real segment
    val before2 = segNames
    sc.sql("MERGE INTO bldml.ns.t t USING " +
      "(SELECT * FROM VALUES (1L), (5L), (9L) AS v(doc_id)) s " +
      "ON t.doc_id = s.doc_id " +
      "WHEN MATCHED THEN UPDATE SET n_chars = t.n_chars + 1000000")
    val replaced2 = before2 -- segNames
    assert(replaced2.size == 1,
      s"MERGE on 3 one-stripe ids must rewrite exactly that stripe, " +
        s"rewrote ${replaced2.size}: $replaced2")
    assert(sc.sql("SELECT COUNT(*) FROM bldml.ns.t " +
      "WHERE n_chars >= 1000000").head().getLong(0) == 3)
    // untouched rows intact: total row count only lost the DELETEd copies
    val expect = sc.sql("SELECT COUNT(*) FROM bldml_src " +
      s"WHERE source <> '$fp'").head().getLong(0)
    assert(sc.sql("SELECT COUNT(*) FROM bldml.ns.t").head().getLong(0)
      == expect)
  }

  test("runtime filtering prunes segments via stats envelopes on non-id join keys") {
    val tmp = Files.createTempDirectory("docstore_rtstats").toString
    Seq("fr", "en", "de", "zh").foreach(l =>
      docs.where(col("lang") === l).coalesce(1).write
        .format("graft-docstore").option("path", tmp)
        .mode("append").save())
    def store = spark.read.format("graft-docstore").option("path", tmp).load()
    def dim = docs.select(col("lang").as("dim_lang")).distinct()
      .where(col("dim_lang").isin("en", "zh"))
    graft.sources.DocStoreScan.lastRuntimePlanned = -1
    val joined = store.join(broadcast(dim), col("lang") === col("dim_lang"))
      .agg(count(lit(1)), sum("n_chars"))
    val row = joined.collect()(0)
    val planned = graft.sources.DocStoreScan.lastRuntimePlanned
    assert(planned == 2,
      s"expected the lang stats envelopes to keep exactly the en/zh " +
        s"segments, planned=$planned\n" +
        joined.queryExecution.executedPlan.toString)
    val expect = docs.where(col("lang").isin("en", "zh"))
      .agg(count(lit(1)), sum("n_chars")).collect()(0)
    assert(row.toSeq == expect.toSeq)
  }

  test("system.analyze backfills stats on a pre-stats table; pruning and agg serve after") {
    val root = Files.createTempDirectory("docstore_analyze").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.ancat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.ancat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .createOrReplaceTempView("an_src")
    sc.sql("CREATE NAMESPACE ancat.ns")
    sc.sql("CREATE TABLE ancat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING)")
    Seq("fr", "en", "de").foreach(l => sc.sql(
      s"INSERT INTO ancat.ns.t SELECT * FROM an_src WHERE lang = '$l'"))
    // simulate a pre-stats table: strip the S, lines from the manifest
    val tdir = java.nio.file.Paths.get(root, "ns", "t")
    import scala.jdk.CollectionConverters._
    Files.write(tdir.resolve("MANIFEST"),
      Files.readAllLines(tdir.resolve("MANIFEST")).asScala
        .filterNot(_.startsWith("S,")).mkString("\n").getBytes("UTF-8"))
    def en = sc.sql("SELECT * FROM ancat.ns.t WHERE lang = 'en'")
    assert(plannedOf(en) == ((3, 3)), physical(en)) // nothing to prune with
    val expect = en.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val r = sc.sql("CALL ancat.system.analyze('ns.t')").head
    assert(r.getLong(0) == 3 && r.getLong(1) == 4, r.toString)
    assert(graft.sources.DocStoreCommitOps.isRewriteCommit(
      tdir.toString, r.getLong(2))) // metadata-only, CDC skips it
    // data skipping works now, values identical
    assert(plannedOf(en) == ((1, 3)), physical(en))
    assert(en.orderBy("doc_id").collect().map(_.toSeq).toSeq == expect)
    // ...and the stats-backed metadata aggregate serves again
    val agg = sc.sql(
      "SELECT MIN(n_chars), MAX(n_chars), COUNT(n_chars) FROM ancat.ns.t")
    assert(agg.queryExecution.executedPlan.toString.contains("manifest-only"))
    assert(agg.head.toSeq == docs.where(col("lang").isin("fr", "en", "de"))
      .agg(min("n_chars"), max("n_chars"), count("n_chars")).head.toSeq)
  }

  test("vacuum dry_run reports reclaimable files without touching them") {
    val root = Files.createTempDirectory("docstore_dryrun").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.drcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.drcat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .coalesce(1).createOrReplaceTempView("dr_src")
    sc.sql("CREATE NAMESPACE drcat.ns")
    sc.sql("CREATE TABLE drcat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING)")
    sc.sql("INSERT INTO drcat.ns.t SELECT * FROM dr_src")
    sc.sql("UPDATE drcat.ns.t SET lang = 'zz' WHERE doc_id < 50") // CoW: retained file
    val tdir = java.nio.file.Paths.get(root, "ns", "t")
    def gds = {
      import scala.jdk.CollectionConverters._
      val st = Files.list(tdir)
      try st.iterator().asScala
        .count(_.getFileName.toString.endsWith(".gds")) finally st.close()
    }
    val before = gds
    val dry = sc.sql("CALL drcat.system.vacuum('ns.t', true)").head
    assert(dry.getLong(0) > 0 && dry.getLong(1) > 0, dry.toString)
    // nothing deleted, history intact (time travel still works)
    assert(gds == before)
    assert(sc.sql("SELECT COUNT(*) FROM drcat.ns.t VERSION AS OF 1")
      .head.getLong(0) == 500)
    // the real vacuum reclaims exactly what the dry run promised
    val real = sc.sql("CALL drcat.system.vacuum('ns.t')").head
    assert(real.getLong(0) == dry.getLong(0) &&
      real.getLong(1) == dry.getLong(1))
    assert(gds == before - dry.getLong(0))
  }

  test("graft.write.max-rows-per-segment rolls segments at the cap") {
    val root = Files.createTempDirectory("docstore_maxrows").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.mrcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.mrcat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .coalesce(1).createOrReplaceTempView("mr_src")
    sc.sql("CREATE NAMESPACE mrcat.ns")
    sc.sql("CREATE TABLE mrcat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING) " +
      "TBLPROPERTIES ('graft.write.max-rows-per-segment' = '100')")
    sc.sql("INSERT INTO mrcat.ns.t SELECT * FROM mr_src") // 500 rows, 1 task
    val tdir = java.nio.file.Paths.get(root, "ns", "t").toString
    val segs = DocStore.readManifest(tdir)
    assert(segs.size == 5, segs.map(s => s.name -> s.rows))
    assert(segs.forall(_.rows <= 100), segs.map(_.rows))
    // content unharmed, and each rolled segment carries its own stats
    assert(sc.sql("SELECT COUNT(*), SUM(n_chars) FROM mrcat.ns.t")
      .head.toSeq == docs.agg(count(lit(1)), sum("n_chars")).head.toSeq)
    assert(segs.forall(_.stats.nonEmpty))
    // a bad value refuses at write time
    sc.sql("CREATE TABLE mrcat.ns.bad (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING) " +
      "TBLPROPERTIES ('graft.write.max-rows-per-segment' = '0')")
    assert(intercept[Exception] {
      sc.sql("INSERT INTO mrcat.ns.bad SELECT * FROM mr_src LIMIT 1")
    }.getMessage.contains("positive"))
  }

  test("GROUP BY a partition column serves from the manifest; non-partition keys fall back") {
    val root = Files.createTempDirectory("docstore_gagg").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.gacat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.gacat.root" -> root)
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .createOrReplaceTempView("ga_src")
    sc.sql("CREATE NAMESPACE gacat.ns")
    sc.sql("CREATE TABLE gacat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING) PARTITIONED BY (lang)")
    sc.sql("INSERT INTO gacat.ns.t SELECT * FROM ga_src")
    def plan(df: DataFrame) = df.queryExecution.executedPlan.toString
    val grouped = sc.sql("SELECT lang, COUNT(*) AS n, MIN(doc_id) AS lo, " +
      "MAX(n_chars) AS hi, COUNT(n_chars) AS nn " +
      "FROM gacat.ns.t GROUP BY lang ORDER BY lang")
    assert(plan(grouped).contains("manifest-only"), plan(grouped))
    assert(plan(grouped).contains("groupBy=[lang]"), plan(grouped))
    val expect = docs.groupBy("lang")
      .agg(count(lit(1)), min("doc_id"), max("n_chars"), count("n_chars"))
      .orderBy("lang").collect().map(_.toSeq).toSeq
    assert(grouped.collect().map(_.toSeq).toSeq == expect)
    // grouping by a NON-partition column cannot serve from metadata
    val bySource = sc.sql(
      "SELECT source, COUNT(*) FROM gacat.ns.t GROUP BY source")
    assert(!plan(bySource).contains("manifest-only"), plan(bySource))
    assert(bySource.count() == docs.select("source").distinct().count())
    // ...nor can grouping by a bucket-transform partition level
    sc.sql("CREATE TABLE gacat.ns.b (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING) " +
      "PARTITIONED BY (bucket(4, doc_id))")
    sc.sql("INSERT INTO gacat.ns.b SELECT * FROM ga_src")
    val byId = sc.sql(
      "SELECT doc_id, COUNT(*) FROM gacat.ns.b GROUP BY doc_id")
    assert(!plan(byId).contains("manifest-only"), plan(byId))
  }

  test("CDC timestamp windows resolve through commit times; bounds refuse loudly") {
    val root = Files.createTempDirectory("docstore_cdcts").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.tscat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.tscat.root" -> root)
    sc.sql("CREATE NAMESPACE tscat.ns")
    sc.sql("CREATE TABLE tscat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING)")
    (1 to 3).foreach(i => sc.sql(
      s"INSERT INTO tscat.ns.t VALUES ($i, ${i * 10}, 'en', 's', 'x')"))
    val tablePath = java.nio.file.Paths.get(root, "ns", "t").toString
    val times = graft.sources.DocStoreCommitOps.versionTimes(tablePath).toMap
    def cdf(opts: (String, String)*): Set[Long] = {
      val r = opts.foldLeft(sc.read.format("graft-docstore")
        .option("path", tablePath).option("readChangeFeed", "true")) {
        case (b, (k, v)) => b.option(k, v) }
      r.load().select("_commit_version").collect()
        .map(_.getLong(0)).toSet
    }
    // start = earliest version at or after the instant (Delta's rule)
    assert(cdf("startingTimestamp" -> times(2L).toString) == Set(2L, 3L))
    assert(cdf("startingTimestamp" -> (times(2L) - 1).toString) == Set(2L, 3L))
    // end = latest version at or before
    assert(cdf("endingTimestamp" -> times(2L).toString) == Set(1L, 2L))
    // a one-commit window, and the ISO-8601 form
    assert(cdf("startingTimestamp" -> times(2L).toString,
      "endingTimestamp" -> times(2L).toString) == Set(2L))
    assert(cdf("startingTimestamp" ->
      java.time.Instant.ofEpochMilli(times(3L)).toString) == Set(3L))
    // refusals: both bounds of one end; out-of-history instants
    assert(intercept[Exception] {
      cdf("startingVersion" -> "1", "startingTimestamp" -> "0")
    }.getMessage.contains("not both"))
    assert(intercept[Exception] {
      cdf("startingTimestamp" -> (times(3L) + 60000).toString)
    }.getMessage.contains("after the last commit"))
    assert(intercept[Exception] {
      cdf("endingTimestamp" -> (times(1L) - 1).toString)
    }.getMessage.contains("before the first retained commit"))
    // an inverted window refuses — never a silent empty feed
    assert(intercept[Exception] {
      cdf("startingVersion" -> "3", "endingVersion" -> "2")
    }.getMessage.contains("inverted"))
    // a STREAM refuses an upper bound instead of silently ignoring it
    // (the refusal surfaces on the stream thread, not at start())
    val qx = sc.readStream.format("graft-docstore").option("path", tablePath)
      .option("readChangeFeed", "true").option("endingVersion", "2")
      .load().writeStream.format("noop")
      .option("checkpointLocation",
        Files.createTempDirectory("cdc_noop").toString)
      .start()
    val ex = intercept[Exception] {
      try qx.processAllAvailable() finally qx.stop() }
    val chain = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString("|")
    assert(chain.contains("BATCH change-feed"), chain)
  }

  test("idempotent writes: txnAppId/txnVersion dedupe retried batch commits") {
    val tmp = Files.createTempDirectory("docstore_txn").toString
    def put(app: String, v: Long, lang: String): Unit =
      docs.where(col("lang") === lang).write.format("graft-docstore")
        .option("path", tmp).option("txnAppId", app)
        .option("txnVersion", v.toString).mode("append").save()
    def readBack = spark.read.format("graft-docstore")
      .option("path", tmp).load()
    def count() = readBack.count()
    val nFr = docs.where(col("lang") === "fr").count()
    val nEn = docs.where(col("lang") === "en").count()
    put("etl", 1, "fr")
    assert(count() == nFr)
    // an exact retry of the same (app, version) is a silent no-op
    put("etl", 1, "fr")
    assert(count() == nFr)
    // ...and leaves no staged litter behind
    import scala.jdk.CollectionConverters._
    val st = Files.list(java.nio.file.Paths.get(tmp))
    val staged = try st.iterator().asScala
      .count(_.getFileName.toString.startsWith(".stg-")) finally st.close()
    assert(staged == 0)
    // a LOWER version than recorded is also a retry
    put("etl", 2, "en")
    put("etl", 1, "fr")
    assert(count() == nFr + nEn)
    // identities are independent
    put("other", 1, "fr")
    assert(count() == 2 * nFr + nEn)
    // the recorded versions survive unrelated commits and compaction
    docs.where(col("lang") === "de").write.format("graft-docstore")
      .option("path", tmp).mode("append").save()
    put("etl", 2, "en") // still a retry after the plain append
    assert(readBack.where(col("lang") === "en").count() == nEn)
    assert(DocStore.readTxns(tmp) == Map("etl" -> 2L, "other" -> 1L))
    // half a pair refuses loudly; so does a non-long version
    assert(intercept[Exception] {
      docs.limit(1).write.format("graft-docstore").option("path", tmp)
        .option("txnAppId", "x").mode("append").save()
    }.getMessage.contains("set together"))
    assert(intercept[Exception] {
      docs.limit(1).write.format("graft-docstore").option("path", tmp)
        .option("txnAppId", "x").option("txnVersion", "nope")
        .mode("append").save()
    }.getMessage.contains("must be a long"))
  }

  test("TIMESTAMP AS OF: boundary-inclusive latest-commit rule; pre-history refuses") {
    val root = Files.createTempDirectory("docstore_tt").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.tcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.tcat.root" -> root)
    sc.sql("CREATE NAMESPACE tcat.ns")
    sc.sql("CREATE TABLE tcat.ns.t (doc_id BIGINT NOT NULL, n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING)")
    // three rapid-fire commits: the publish path must keep commit times
    // strictly monotone even when the wall clock ties within 1 ms
    (1 to 3).foreach(i => sc.sql(
      s"INSERT INTO tcat.ns.t VALUES ($i, ${i * 10}, 'en', 's', 'x')"))
    val times = graft.sources.DocStoreCommitOps.versionTimes(
      java.nio.file.Paths.get(root, "ns", "t").toString)
    assert(times.map(_._1) == Seq(1L, 2L, 3L))
    assert(times.map(_._2).sliding(2).forall(w => w(0) < w(1)),
      times.mkString(","))
    def rowsAt(ms: Long): Long = sc.sql(
      s"SELECT COUNT(*) FROM tcat.ns.t TIMESTAMP AS OF timestamp_millis($ms)")
      .head.getLong(0)
    // exactly AT a commit time reads that commit (boundary inclusive);
    // between commits reads the older one (latest <= t)
    assert(rowsAt(times(0)._2) == 1)
    assert(rowsAt(times(1)._2) == 2)
    assert(rowsAt(times(2)._2) == 3)
    assert(rowsAt(times(1)._2 - 1) == 1)
    // after the head: still the head
    assert(rowsAt(times(2)._2 + 60000) == 3)
    // before the first retained commit: loud refusal, names the earliest
    val e = intercept[Exception] { rowsAt(times(0)._2 - 1) }
    assert(e.getMessage.contains("before the first retained commit"),
      e.getMessage)
    // history exposes the same instants as committed_at
    val hist = sc.sql("CALL tcat.system.history('ns.t')").collect()
      .map(r => r.getLong(0) ->
        r.getTimestamp(5).getTime).toMap
    assert(hist == times.toMap, s"$hist vs $times")
  }

  test("ADVICE r13: merge-on-read inserts enforce contracts; identity rides MERGE/UPDATE") {
    val root = Files.createTempDirectory("docstore_mor_checks").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.mrc" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.mrc.root" -> root)
    sc.sql("CREATE NAMESPACE mrc.ns")
    def messages(t: Throwable): String =
      Iterator.iterate(t: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString("|")
    // CHECK constraints reach merge-on-read MERGE inserts (the r12
    // advisor found the delta writer skipped DocStoreChecks entirely)
    sc.sql("CREATE TABLE mrc.ns.t (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING) " +
      "TBLPROPERTIES ('graft.rowlevel.mode' = 'merge-on-read', " +
      "'graft.check.pos' = 'n_chars >= 0')")
    sc.sql("INSERT INTO mrc.ns.t VALUES (1, 10, 'en', 's', 'x'), " +
      "(2, 20, 'pt', 's', 'y')")
    val e1 = intercept[Exception] {
      sc.sql("MERGE INTO mrc.ns.t t USING (SELECT 3L AS doc_id, " +
        "-5L AS n_chars, 'en' AS lang, 's' AS source, 'z' AS text) s " +
        "ON t.doc_id = s.doc_id WHEN NOT MATCHED THEN INSERT *") }
    assert(messages(e1).contains("CHECK constraint 'pos'"), messages(e1))
    assert(sc.sql("SELECT COUNT(*) FROM mrc.ns.t").head.getLong(0) == 2)
    // ... and MoR UPDATE reinserts (DV-delete + fresh-segment insert)
    val e2 = intercept[Exception] {
      sc.sql("UPDATE mrc.ns.t SET n_chars = -7 WHERE doc_id = 1") }
    assert(messages(e2).contains("CHECK constraint 'pos'"), messages(e2))
    assert(sc.sql("SELECT n_chars FROM mrc.ns.t WHERE doc_id = 1")
      .head.getLong(0) == 10)
    // generated-column contract on a MoR table: a MERGE insert with a
    // mismatched derived value refuses through the same compiled path
    sc.sql("CREATE TABLE mrc.ns.g (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT GENERATED ALWAYS AS (LENGTH(text)), lang STRING, " +
      "source STRING, text STRING) " +
      "TBLPROPERTIES ('graft.rowlevel.mode' = 'merge-on-read')")
    sc.sql("INSERT INTO mrc.ns.g VALUES (1, 5, 'en', 's', 'hello')")
    val e3 = intercept[Exception] {
      sc.sql("MERGE INTO mrc.ns.g t USING (SELECT 2L AS doc_id, " +
        "99L AS n_chars, 'en' AS lang, 's' AS source, 'x' AS text) s " +
        "ON t.doc_id = s.doc_id WHEN NOT MATCHED THEN INSERT *") }
    assert(messages(e3)
      .contains("GENERATED ALWAYS AS constraint on column 'n_chars'"),
      messages(e3))
    assert(sc.sql("SELECT COUNT(*) FROM mrc.ns.g").head.getLong(0) == 1)
    // identity through the row-level path: explicit ids refuse on a
    // GENERATED ALWAYS table, omitted (NULL) ids are assigned past the
    // watermark, and an UPDATE PRESERVES the row's existing id
    sc.sql("CREATE TABLE mrc.ns.i (doc_id BIGINT GENERATED ALWAYS " +
      "AS IDENTITY (START WITH 100 INCREMENT BY 10), n_chars BIGINT, " +
      "lang STRING, source STRING, text STRING) " +
      "TBLPROPERTIES ('graft.rowlevel.mode' = 'merge-on-read')")
    sc.sql("INSERT INTO mrc.ns.i (n_chars, lang, source, text) " +
      "VALUES (1, 'a', 's', 'x')")
    val e4 = intercept[Exception] {
      sc.sql("MERGE INTO mrc.ns.i t USING (SELECT 999L AS doc_id, " +
        "2L AS n_chars, 'b' AS lang, 's' AS source, 'y' AS text) s " +
        "ON t.doc_id = s.doc_id WHEN NOT MATCHED THEN INSERT *") }
    assert(messages(e4).contains("GENERATED ALWAYS AS IDENTITY"),
      messages(e4))
    sc.sql("MERGE INTO mrc.ns.i t USING (SELECT 2L AS n_chars, " +
      "'b' AS lang, 's' AS source, 'y' AS text) s " +
      "ON t.text = s.text WHEN NOT MATCHED THEN " +
      "INSERT (n_chars, lang, source, text) " +
      "VALUES (s.n_chars, s.lang, s.source, s.text)")
    val ids = sc.sql("SELECT doc_id FROM mrc.ns.i ORDER BY doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.size == 2 && ids.head == 100L && ids(1) > 100L, s"$ids")
    // UPDATE keeps the identity value (Delta: updating other columns
    // never reassigns) — the preserve path skips the ALWAYS refusal
    sc.sql("UPDATE mrc.ns.i SET lang = 'zz' WHERE doc_id = 100")
    assert(sc.sql("SELECT doc_id, lang FROM mrc.ns.i WHERE lang = 'zz'")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((100L, "zz")))
    // ...but an UPDATE that ASSIGNS the identity column refuses — the
    // rowId carries the original id, so a reassignment is
    // distinguishable from the preserve case (r13 review finding)
    val e5 = intercept[Exception] {
      sc.sql("UPDATE mrc.ns.i SET doc_id = 999 WHERE doc_id = 100") }
    assert(messages(e5).contains("may not assign"), messages(e5))
    assert(sc.sql("SELECT COUNT(*) FROM mrc.ns.i WHERE doc_id = 100")
      .head.getLong(0) == 1)
  }

  test("r13: evolved columns take the full primitive type surface") {
    val root = Files.createTempDirectory("docstore_types").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.tcat13" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.tcat13.root" -> root)
    sc.sql("CREATE NAMESPACE tcat13.ns")
    sc.sql("CREATE TABLE tcat13.ns.t (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING)")
    sc.sql("INSERT INTO tcat13.ns.t VALUES (1, 1, 'en', 's', 'pre')")
    sc.sql("ALTER TABLE tcat13.ns.t ADD COLUMNS (price DOUBLE, " +
      "ratio FLOAT, born DATE, seen TIMESTAMP, ok BOOLEAN, " +
      "amt DECIMAL(10,2))")
    sc.sql("INSERT INTO tcat13.ns.t VALUES " +
      "(2, 2, 'en', 's', 'a', -12.75D, CAST(0.5 AS FLOAT), " +
      "DATE'2024-01-02', TIMESTAMP'2024-01-02 03:04:05.123456', " +
      "true, 12.34)")
    sc.sql("INSERT INTO tcat13.ns.t VALUES " +
      "(3, 3, 'en', 's', 'b', NULL, NULL, NULL, NULL, NULL, NULL)")
    // pre-evolution row null-pads; typed values round-trip exactly
    // (negative double included — the sortable-bits encoding)
    val rows = sc.sql("SELECT price, ratio, born, seen, ok, amt " +
      "FROM tcat13.ns.t ORDER BY doc_id").collect()
    assert(rows(0).toSeq.forall(_ == null), rows(0).toString)
    assert(rows(1).getDouble(0) == -12.75 && rows(1).getFloat(1) == 0.5f)
    assert(rows(1).getDate(2).toString == "2024-01-02")
    assert(rows(1).getTimestamp(3).toString == "2024-01-02 03:04:05.123456")
    assert(rows(1).getBoolean(4))
    assert(rows(1).getDecimal(5).toString == "12.34")
    assert(rows(2).toSeq.forall(_ == null), rows(2).toString)
    // ordering over the encoded payload == double order
    assert(sc.sql("SELECT doc_id FROM tcat13.ns.t ORDER BY price NULLS LAST")
      .collect().map(_.getLong(0)).take(1).toSeq == Seq(2L))
    // stats prune on the encoded envelope: a fresh positive-price
    // segment is skipped by price < 0 (negatives order BELOW under
    // the sortable-bits encoding), kept by price > 90
    sc.sql("INSERT INTO tcat13.ns.t VALUES " +
      "(4, 4, 'en', 's', 'c', 99.5D, CAST(1.5 AS FLOAT), " +
      "DATE'2025-06-30', TIMESTAMP'2025-06-30 12:00:00', false, 1.00)")
    val path = java.nio.file.Paths.get(root, "ns", "t").toString
    def readBack = sc.read.format("graft-docstore").option("path", path).load()
    def planned(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      val m = "segments=(\\d+)/(\\d+)".r.findFirstMatchIn(
        df.queryExecution.executedPlan.toString).get
      (m.group(1).toInt, m.group(2).toInt)
    }
    // 4 segments: pre-evolution (no price section, hence no stats —
    // conservatively KEPT under any price predicate), the negative-
    // price row, the all-null row (prunable: nulls == rows), the
    // positive-price row. Typed predicates prune on the encoded
    // envelopes, keeping only the pre-evolution + in-envelope segments.
    assert(planned(readBack.where(col("price") < 0.0)) == ((2, 4)))
    assert(planned(readBack.where(col("price") > 90.0)) == ((2, 4)))
    assert(planned(readBack.where(
      col("born") === lit("2025-06-30").cast("date"))) == ((2, 4)))
    assert(planned(readBack.where(col("ok") === false)) == ((2, 4)))
    assert(readBack.where(col("price") < 0.0).select("doc_id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    // metadata-only widenings over unchanged bytes
    sc.sql("ALTER TABLE tcat13.ns.t ALTER COLUMN ratio TYPE DOUBLE")
    sc.sql("ALTER TABLE tcat13.ns.t ALTER COLUMN amt TYPE DECIMAL(14,2)")
    val widened = sc.sql("SELECT ratio, amt FROM tcat13.ns.t " +
      "WHERE doc_id = 2").head
    assert(widened.getDouble(0) == 0.5 && widened.getDecimal(1).toString == "12.34")
    // CoW UPDATE re-encodes through the same writer
    sc.sql("UPDATE tcat13.ns.t SET price = -1.25D WHERE doc_id = 3")
    assert(sc.sql("SELECT price FROM tcat13.ns.t WHERE doc_id = 3")
      .head.getDouble(0) == -1.25)
    // refusals: nested types (r14: DECIMAL(20,2) now lands in the
    // 16-byte class instead of refusing — see the wide-decimal test);
    // narrowing; cross-scale decimal; identity partitioning on DOUBLE
    def msg(t: Throwable): String =
      Iterator.iterate(t: Throwable)(_.getCause).takeWhile(_ != null)
        .map(m => String.valueOf(m.getMessage)).mkString("|")
    // r15: clean nested types ACCEPT (opaque payload class); only a
    // bad LEAF refuses toward the variant path
    assert(msg(intercept[Exception] { sc.sql(
      "ALTER TABLE tcat13.ns.t ADD COLUMNS (blobs ARRAY<BINARY>)") })
      .contains("q127_json_shred"))
    sc.sql("ALTER TABLE tcat13.ns.t ADD COLUMNS (tags ARRAY<STRING>)")
    sc.sql("INSERT INTO tcat13.ns.t VALUES (100, 1, 'en', 's', 'x', " +
      "NULL, NULL, NULL, NULL, NULL, NULL, array('a', 'b'))")
    assert(sc.sql("SELECT tags[1] FROM tcat13.ns.t WHERE doc_id = 100")
      .head.getString(0) == "b")
    assert(sc.sql("SELECT COUNT(*) FROM tcat13.ns.t WHERE tags IS NULL")
      .head.getLong(0) >= 1, "pre-ADD rows read NULL tags")
    // narrowing / cross-scale refusals (Spark's own analyzer rejects
    // DOUBLE->FLOAT before the catalog; the catalog's metadata-safe
    // gate backstops whatever reaches it)
    intercept[Exception] { sc.sql(
      "ALTER TABLE tcat13.ns.t ALTER COLUMN price TYPE FLOAT") }
    intercept[Exception] { sc.sql(
      "ALTER TABLE tcat13.ns.t ALTER COLUMN amt TYPE DECIMAL(16,3)") }
    assert(sc.sql("SELECT price FROM tcat13.ns.t WHERE doc_id = 2")
      .head.getDouble(0) == -12.75, "refused ALTERs must not change reads")
    assert(msg(intercept[Exception] { sc.sql(
      "CREATE TABLE tcat13.ns.p (doc_id BIGINT NOT NULL, " +
        "n_chars BIGINT, lang STRING, source STRING, text STRING, " +
        "price DOUBLE) PARTITIONED BY (price)") })
      .contains("identity partition column"))
    // OPTIMIZE cluster_by composes with the new types: single-column
    // clustering is type-generic range partitioning, and the rewritten
    // segments' encoded envelopes prune typed predicates exactly
    sc.sql("CALL tcat13.system.optimize('ns.t', 2, 'price')")
    val afterOpt = planned(readBack.where(col("price") > 90.0))
    assert(afterOpt._1 < afterOpt._2 && afterOpt._1 >= 1, afterOpt.toString)
    assert(readBack.where(col("price") > 90.0).select("doc_id")
      .collect().map(_.getLong(0)).toSeq == Seq(4L))
  }

  test("r15: nested evolved columns — payloads, null-count pruning, lifecycle") {
    val root = Files.createTempDirectory("docstore_nested").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.tcat15" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.tcat15.root" -> root)
    sc.sql("CREATE NAMESPACE tcat15.ns")
    sc.sql("CREATE TABLE tcat15.ns.t (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING)")
    // segment 1: pre-evolution (no nested sections on disk)
    sc.sql("INSERT INTO tcat15.ns.t VALUES (1, 1, 'en', 's', 'pre')")
    sc.sql("ALTER TABLE tcat15.ns.t ADD COLUMNS (tags ARRAY<STRING>, " +
      "meta STRUCT<a: BIGINT, b: STRING>, kv MAP<STRING, BIGINT>, " +
      "deep ARRAY<STRUCT<k: STRING, w: DECIMAL(24,2)>>)")
    // segment 2: every nested kind populated, incl. interior nulls and
    // a wide-decimal leaf
    sc.sql("INSERT INTO tcat15.ns.t VALUES (2, 2, 'en', 's', 'full', " +
      "array('x', NULL, 'z'), named_struct('a', 7L, 'b', 'bee'), " +
      "map('n', 42L, 'm', NULL), " +
      "array(named_struct('k', 'big', " +
      "'w', CAST('123456789012345678901.25' AS DECIMAL(24,2)))))")
    // segment 3: nested columns all-null (prunable by null counts)
    sc.sql("INSERT INTO tcat15.ns.t VALUES (3, 3, 'en', 's', 'nulls', " +
      "NULL, NULL, NULL, NULL)")
    // values round-trip exactly, pre-ADD rows null-pad
    val r = sc.sql("SELECT tags, meta.a, meta.b, element_at(kv, 'n'), " +
      "kv['m'], deep[0].k, deep[0].w FROM tcat15.ns.t WHERE doc_id = 2")
      .head
    assert(r.getSeq[String](0) == Seq("x", null, "z"), r.toString)
    assert(r.getLong(1) == 7L && r.getString(2) == "bee")
    assert(r.getLong(3) == 42L && r.isNullAt(4))
    assert(r.getString(5) == "big")
    assert(r.getDecimal(6).toString == "123456789012345678901.25")
    assert(sc.sql("SELECT tags, meta, kv, deep FROM tcat15.ns.t " +
      "WHERE doc_id = 1").head.toSeq.forall(_ == null))
    // null-count pruning is exact: IS NULL prunes the fully-populated
    // segment (nulls = 0), IS NOT NULL prunes the all-null one
    // (nulls = rows); the stat-less pre-ADD segment is conservatively
    // KEPT both ways and resolved row-level
    val path = java.nio.file.Paths.get(root, "ns", "t").toString
    def readBack = sc.read.format("graft-docstore")
      .option("path", path).load()
    def planned(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      val m = "segments=(\\d+)/(\\d+)".r.findFirstMatchIn(
        df.queryExecution.executedPlan.toString).get
      (m.group(1).toInt, m.group(2).toInt)
    }
    assert(planned(readBack.where(col("tags").isNull)) == ((2, 3)))
    assert(planned(readBack.where(col("tags").isNotNull)) == ((2, 3)))
    assert(readBack.where(col("tags").isNotNull).select("doc_id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    // ANALYZE must CARRY FORWARD nested null-count stats, not erase
    // them with its scalar-column rewrite (r15 review finding: the
    // whole-map stats replace silently killed nested IsNull pruning)
    sc.sql("CALL tcat15.system.analyze('ns.t')")
    assert(planned(readBack.where(col("tags").isNull)) == ((2, 3)),
      "ANALYZE erased nested null-count stats (IS NULL prune lost)")
    assert(planned(readBack.where(col("tags").isNotNull)) == ((2, 3)),
      "ANALYZE erased nested null-count stats (IS NOT NULL prune lost)")
    assert(readBack.where(col("meta").isNull).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // NON-widening changes inside a nested column still refuse loudly
    // (r16: leaf WIDENING is now legal via nested-codec generations —
    // covered by its own test below)
    intercept[Exception] { sc.sql(
      // STRING -> BINARY passes Spark's own upcast check, so this
      // exercises OUR refusal, not the analyzer's
      "ALTER TABLE tcat15.ns.t ALTER COLUMN tags TYPE ARRAY<BINARY>") }
    // DROP of a nested column is the same column-mapping retirement as
    // scalars; remaining nested columns keep their sections
    sc.sql("ALTER TABLE tcat15.ns.t DROP COLUMN meta")
    assert(sc.sql("SELECT element_at(kv, 'n') FROM tcat15.ns.t " +
      "WHERE doc_id = 2").head.getLong(0) == 42L)
    // GDS3 compression wraps nested payloads like any section
    sc.sql("ALTER TABLE tcat15.ns.t SET TBLPROPERTIES " +
      "('graft.write.compression' = 'deflate')")
    sc.sql("INSERT INTO tcat15.ns.t VALUES (4, 4, 'en', 's', 'zip', " +
      "array('c'), map('n', 9L), " +
      "array(named_struct('k', 'w', 'w', CAST(1.25 AS DECIMAL(24,2)))))")
    assert(sc.sql("SELECT tags[0], kv['n'] FROM tcat15.ns.t " +
      "WHERE doc_id = 4").head.toSeq == Seq("c", 9L))
    // CoW row-level ops rewrite nested payloads through the writer
    sc.sql("DELETE FROM tcat15.ns.t WHERE doc_id = 3")
    assert(sc.sql("SELECT COUNT(*) FROM tcat15.ns.t").head.getLong(0) == 3L)
    assert(sc.sql("SELECT SUM(size(tags)) FROM tcat15.ns.t")
      .head.getLong(0) == 4L) // 3 + 1 surviving elements
    // the STREAMING read decodes nested payloads through the same
    // segment reader — drain the table and compare to the batch face
    val snap = s"nested_stream_${System.nanoTime()}"
    val q = sc.readStream.format("graft-docstore")
      .option("path", path).option("maxSegmentsPerBatch", "1").load()
      .selectExpr("doc_id", "size(tags) AS nt", "element_at(kv, 'n') AS kn")
      .writeStream.format("memory").queryName(snap)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = sc.table(snap).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val batch = readBack
      .selectExpr("doc_id", "size(tags) AS nt", "element_at(kv, 'n') AS kn")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(streamed == batch, s"stream != batch over nested columns:\n" +
      s"stream $streamed\nbatch $batch")
    // MoR deletion vectors compose with nested payloads (DV positions
    // are section-agnostic; the reader skips rows before decode)
    sc.sql("CREATE TABLE tcat15.ns.m (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING, " +
      "tags ARRAY<STRING>) " +
      "TBLPROPERTIES ('graft.rowlevel.mode' = 'merge-on-read')")
    // ONE 3-row segment (coalesced), so the mid-segment delete is
    // misaligned and must take the deletion-vector path
    sc.sql("SELECT * FROM VALUES " +
      "(1L, 1L, 'en', 's', 'a', array('x')), " +
      "(2L, 2L, 'en', 's', 'b', array('y', 'z')), " +
      "(3L, 3L, 'en', 's', 'c', CAST(NULL AS ARRAY<STRING>)) " +
      "AS v(doc_id, n_chars, lang, source, text, tags)")
      .coalesce(1).createOrReplaceTempView("nested_mor_src")
    sc.sql("INSERT INTO tcat15.ns.m SELECT * FROM nested_mor_src")
    sc.sql("DELETE FROM tcat15.ns.m WHERE doc_id = 2")
    val mpath = java.nio.file.Paths.get(root, "ns", "m").toString
    assert(DocStore.readDeletes(mpath).values.map(_.length).sum == 1,
      "expected a merge-on-read deletion vector, not a rewrite")
    assert(sc.sql("SELECT doc_id, coalesce(size(tags), -1) " +
      "FROM tcat15.ns.m ORDER BY doc_id").collect().map(r =>
      (r.getLong(0), r.getInt(1))).toSeq == Seq((1L, 1), (3L, -1)))
    // CDF change rows carry nested values: the insert commit's rows
    // surface tags through the change feed intact
    val cdf = sc.read.format("graft-docstore").option("path", mpath)
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .load()
    val ins = cdf.where(col("_change_type") === "insert")
      .selectExpr("doc_id", "coalesce(size(tags), -1) AS nt")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(ins.toSeq == Seq((1L, 1), (2L, 2), (3L, -1)), ins.mkString(","))
    assert(cdf.where(col("_change_type") === "delete")
      .selectExpr("doc_id", "size(tags)").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((2L, 2)),
      "the DV delete's change row must replay the nested payload")
    // time travel ACROSS the nested evolution follows the engine's
    // Delta-style contract — the LIVE schema over the old data, nested
    // columns null-padded (schema archives serve RESTORE/CLONE)
    val v1 = sc.sql("SELECT * FROM tcat15.ns.t VERSION AS OF 1")
    assert(v1.schema.fieldNames.contains("tags") &&
      !v1.schema.fieldNames.contains("meta"), // dropped from live schema
      s"time travel reads the LIVE schema, got " +
        s"${v1.schema.fieldNames.mkString(",")}")
    val v1row = v1.collect()
    assert(v1row.length == 1 &&
      v1row(0).isNullAt(v1.schema.fieldIndex("tags")),
      "pre-nested data must null-pad the nested columns under travel")
  }

  test("r16: struct-leaf stats — leaf range/equality/null predicates skip segments") {
    // r15 verdict item 1: struct leaves have a fixed path and scalar
    // type, so they carry the same per-segment envelopes scalar
    // sections do (Delta nested minValues / Iceberg field-id bounds);
    // a pushed `meta.w > x` must SKIP segments, not just filter rows.
    val root = Files.createTempDirectory("docstore_leafstats").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.tcat16" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.tcat16.root" -> root)
    sc.sql("CREATE NAMESPACE tcat16.ns")
    sc.sql("CREATE TABLE tcat16.ns.t (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING)")
    // segment 1: pre-evolution — no meta section, no leaf stats →
    // conservatively KEPT under any meta.* predicate
    sc.sql("INSERT INTO tcat16.ns.t VALUES (1, 1, 'en', 's', 'pre')")
    sc.sql("ALTER TABLE tcat16.ns.t ADD COLUMNS (" +
      "meta STRUCT<w: BIGINT, tag: STRING, inner: STRUCT<d: DOUBLE>>, " +
      "arr ARRAY<BIGINT>)")
    // segments 2-5: one single-row segment per insert, w in
    // {10, 20, 100, 110} (deterministic segment layout)
    sc.sql("INSERT INTO tcat16.ns.t VALUES " +
      "(2, 2, 'en', 's', 'lo1', named_struct('w', 10L, 'tag', 'alpha', " +
      "'inner', named_struct('d', 0.5D)), array(1L))")
    sc.sql("INSERT INTO tcat16.ns.t VALUES " +
      "(3, 3, 'en', 's', 'lo2', named_struct('w', 20L, 'tag', 'beta', " +
      "'inner', named_struct('d', 0.75D)), array(2L))")
    sc.sql("INSERT INTO tcat16.ns.t VALUES " +
      "(4, 4, 'en', 's', 'hi1', named_struct('w', 100L, 'tag', 'omega', " +
      "'inner', named_struct('d', 9.5D)), array(3L))")
    sc.sql("INSERT INTO tcat16.ns.t VALUES " +
      "(5, 5, 'en', 's', 'hi2', named_struct('w', 110L, 'tag', 'zeta', " +
      "'inner', CAST(NULL AS STRUCT<d: DOUBLE>)), array(4L))")
    // segment 6: meta entirely null → leaf nulls == rows
    sc.sql("INSERT INTO tcat16.ns.t VALUES (6, 6, 'en', 's', 'nul', " +
      "NULL, NULL)")
    val path = java.nio.file.Paths.get(root, "ns", "t").toString
    def readBack = sc.read.format("graft-docstore")
      .option("path", path).load()
    def planned(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      val m = "segments=(\\d+)/(\\d+)".r.findFirstMatchIn(
        df.queryExecution.executedPlan.toString).get
      (m.group(1).toInt, m.group(2).toInt)
    }
    // BIGINT leaf comparison: keeps pre-evolution (stat-less) + the
    // in-envelope segments only
    assert(planned(readBack.where(col("meta.w") > 50L)) == ((3, 6)),
      "meta.w > 50 must skip the low-range and all-null segments")
    assert(planned(readBack.where(col("meta.w") <= 20L)) == ((3, 6)))
    assert(planned(readBack.where(col("meta.w") === 15L)) == ((1, 6)),
      "an equality between the single-value envelopes keeps only the " +
        "stat-less pre-evolution segment")
    // results stay row-exact (residual re-applied)
    assert(readBack.where(col("meta.w") > 50L).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(4L, 5L))
    // STRING leaf: truncated StrBound envelopes prune equality
    assert(planned(readBack.where(col("meta.tag") === "omega")) == ((2, 6)))
    assert(readBack.where(col("meta.tag") === "omega").select("doc_id")
      .collect().map(_.getLong(0)).toSeq == Seq(4L))
    // DOUBLE leaf two levels down (struct-in-struct); the segment
    // whose INNER struct is null prunes too (nulls == rows)
    assert(planned(readBack.where(col("meta.inner.d") > 5.0)) == ((2, 6)))
    assert(readBack.where(col("meta.inner.d") > 5.0).select("doc_id")
      .collect().map(_.getLong(0)).toSeq == Seq(4L))
    // leaf IS NULL / IS NOT NULL: per-leaf null counts are exact
    // (ancestor-null counts as leaf-null — SQL's meta.w semantics);
    // fully-populated segments prune under IS NULL
    assert(planned(readBack.where(col("meta.w").isNull)) == ((2, 6)),
      "meta.w IS NULL must skip the fully-populated segments")
    assert(readBack.where(col("meta.inner.d").isNull).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 5L, 6L))
    // ARRAY column: no leaf surface — the comparison itself keeps
    // everything; only the inferred isnotnull(arr) prunes (the
    // all-null segment, via the existing whole-value null counts)
    assert(planned(readBack.where(
      org.apache.spark.sql.functions.element_at(col("arr"), 1) > 2L))
      ._1 == 5)
    // OPTIMIZE rewrites through the writer: leaf stats re-fold on the
    // compacted segments and pruning survives the rewrite
    sc.sql("CALL tcat16.system.optimize('ns.t', 2)")
    val afterOpt = planned(readBack.where(col("meta.w") > 50L))
    assert(afterOpt._1 < afterOpt._2,
      s"leaf pruning lost after OPTIMIZE: $afterOpt")
    assert(readBack.where(col("meta.w") > 50L).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(4L, 5L))
  }

  test("r16: nested leaf widening — three generations read through one declared schema") {
    // r15 verdict item 3 (Iceberg's int→long-inside-structs surface):
    // a widened leaf changes the payload byte layout of FUTURE writes,
    // so decode dispatches on the nested-codec GENERATION each segment
    // was written under (SCHEMA.gen-<g> archives + per-segment stamp).
    val root = Files.createTempDirectory("docstore_nwiden").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.tcat17" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.tcat17.root" -> root)
    sc.sql("CREATE NAMESPACE tcat17.ns")
    sc.sql("CREATE TABLE tcat17.ns.t (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING)")
    // generation: pre-ADD (null-pad)
    sc.sql("INSERT INTO tcat17.ns.t VALUES (1, 1, 'en', 's', 'pre')")
    sc.sql("ALTER TABLE tcat17.ns.t ADD COLUMNS (" +
      "meta STRUCT<w: INT, f: FLOAT, amt: DECIMAL(10,2)>, " +
      "arr ARRAY<INT>, kv MAP<STRING, INT>)")
    // generation 0: INT/FLOAT/DECIMAL(10,2) leaf layouts
    sc.sql("INSERT INTO tcat17.ns.t VALUES (2, 2, 'en', 's', 'g0', " +
      "named_struct('w', 7, 'f', CAST(1.5 AS FLOAT), " +
      "'amt', CAST(12.34 AS DECIMAL(10,2))), " +
      "array(1, NULL, 3), map('a', 4))")
    // widen all three families + the array element + the map value —
    // Spark's DDL addresses nested leaves directly (meta.w,
    // arr.element, kv.value), one generation bump each
    sc.sql("ALTER TABLE tcat17.ns.t ALTER COLUMN meta.w TYPE BIGINT")
    sc.sql("ALTER TABLE tcat17.ns.t ALTER COLUMN meta.f TYPE DOUBLE")
    sc.sql("ALTER TABLE tcat17.ns.t ALTER COLUMN meta.amt TYPE DECIMAL(14,2)")
    sc.sql("ALTER TABLE tcat17.ns.t ALTER COLUMN arr.element TYPE BIGINT")
    sc.sql("ALTER TABLE tcat17.ns.t ALTER COLUMN kv.value TYPE BIGINT")
    // generation 5: 8-byte leaf layouts
    sc.sql("INSERT INTO tcat17.ns.t VALUES (3, 3, 'en', 's', 'g5', " +
      "named_struct('w', 5000000000L, 'f', 2.25D, " +
      "'amt', CAST(999999999999.99 AS DECIMAL(14,2))), " +
      "array(6000000000L), map('b', 7000000000L))")
    // one declared schema serves all three generations, values exact
    val rows = sc.sql("SELECT doc_id, meta.w, meta.f, meta.amt, arr, " +
      "kv FROM tcat17.ns.t ORDER BY doc_id").collect()
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(4), rows(0).toString)
    assert(rows(1).getLong(1) == 7L && rows(1).getDouble(2) == 1.5 &&
      rows(1).getDecimal(3).toString == "12.34", rows(1).toString)
    assert(rows(1).getSeq[Any](4) == Seq(1L, null, 3L), rows(1).toString)
    assert(rows(2).getLong(1) == 5000000000L &&
      rows(2).getDouble(2) == 2.25 &&
      rows(2).getDecimal(3).toString == "999999999999.99", rows(2).toString)
    assert(rows(2).getSeq[Any](4) == Seq(6000000000L), rows(2).toString)
    assert(sc.sql("SELECT element_at(kv, 'a'), element_at(kv, 'b') " +
      "FROM tcat17.ns.t WHERE doc_id IN (2, 3) ORDER BY doc_id")
      .collect().map(_.toSeq).toSeq ==
      Seq(Seq(4L, null), Seq(null, 7000000000L)))
    // leaf-stat pruning still fires ACROSS generations: the old
    // segment's int-era envelope and the new segment's long-era one
    // prune under the same BIGINT literal space
    def planned(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      val m = "segments=(\\d+)/(\\d+)".r.findFirstMatchIn(
        df.queryExecution.executedPlan.toString).get
      (m.group(1).toInt, m.group(2).toInt)
    }
    val path = java.nio.file.Paths.get(root, "ns", "t").toString
    def readBack = sc.read.format("graft-docstore")
      .option("path", path).load()
    assert(planned(readBack.where(col("meta.w") > 1000000L)) == ((2, 3)),
      "the int-era segment's leaf envelope must prune under the " +
        "widened BIGINT literal") // pre-ADD kept (stat-less) + g3
    // non-widening nested changes still refuse loudly (narrowing is
    // caught by Spark's own upcast check; a scale change reaches OUR
    // gate and refuses there)
    intercept[Exception] { sc.sql(
      "ALTER TABLE tcat17.ns.t ALTER COLUMN arr.element TYPE INT") }
    intercept[Exception] { sc.sql(
      "ALTER TABLE tcat17.ns.t ALTER COLUMN meta.amt TYPE DECIMAL(16,3)") }
    // OPTIMIZE heals old generations forward: the rewrite decodes per
    // write-time types and re-encodes under the live schema
    sc.sql("CALL tcat17.system.optimize('ns.t', 1)")
    val after = sc.sql("SELECT doc_id, meta.w, arr FROM tcat17.ns.t " +
      "ORDER BY doc_id").collect()
    assert(after(1).getLong(1) == 7L &&
      after(1).getSeq[Any](2) == Seq(1L, null, 3L), after(1).toString)
    assert(after(2).getLong(1) == 5000000000L, after(2).toString)
    assert(DocStore.readManifest(path).forall(_.schemaGen == 5L),
      "OPTIMIZE must re-stamp rewritten segments at the live generation")
    // CDF replays old-generation commits through the archived types
    val cdf = sc.read.format("graft-docstore").option("path", path)
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .option("endingVersion", "3").load()
    assert(cdf.where(col("_change_type") === "insert" &&
        col("doc_id") === 2)
      .selectExpr("meta.w").head.getLong(0) == 7L,
      "CDF must decode the int-era payload by its write-time type")
  }

  test("r16: nested-codec generation survives dropping the widened column") {
    // the r16 review scenario: drop the only generation-carrying
    // column, re-ADD a nested column, widen again — a counter derived
    // from live fields alone would RESET, re-archive an already-used
    // SCHEMA.gen-<g> name (first-writer-wins keeps the STALE one) and
    // silently misdecode the new column's int-era payloads
    val root = Files.createTempDirectory("docstore_gendrop").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.gdcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.gdcat.root" -> root)
    sc.sql("CREATE NAMESPACE gdcat.ns")
    sc.sql("CREATE TABLE gdcat.ns.t (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING)")
    sc.sql("ALTER TABLE gdcat.ns.t ADD COLUMNS (meta STRUCT<w: INT>)")
    sc.sql("INSERT INTO gdcat.ns.t VALUES (1, 1, 'en', 's', 'g0', " +
      "named_struct('w', 7))")
    sc.sql("ALTER TABLE gdcat.ns.t ALTER COLUMN meta.w TYPE BIGINT")
    sc.sql("INSERT INTO gdcat.ns.t VALUES (2, 2, 'en', 's', 'g1', " +
      "named_struct('w', 5000000000L))")
    sc.sql("ALTER TABLE gdcat.ns.t DROP COLUMN meta")
    // the counter must NOT regress: it folds into doc_id's metadata
    val path = java.nio.file.Paths.get(root, "ns", "t").toString
    assert(DocStore.nestedGenOf(DocStore.tableSchema(path)) == 1L,
      "generation regressed after dropping the widened column")
    sc.sql("ALTER TABLE gdcat.ns.t ADD COLUMNS (meta2 STRUCT<v: INT>)")
    sc.sql("INSERT INTO gdcat.ns.t VALUES (3, 3, 'en', 's', 'g1b', " +
      "named_struct('v', 9))")
    // the second widening archives SCHEMA.gen-1 (the meta2-INT era) —
    // a fresh name, not a collision with the meta-era gen-0 archive
    sc.sql("ALTER TABLE gdcat.ns.t ALTER COLUMN meta2.v TYPE BIGINT")
    sc.sql("INSERT INTO gdcat.ns.t VALUES (4, 4, 'en', 's', 'g2', " +
      "named_struct('v', 6000000000L))")
    val rows = sc.sql("SELECT doc_id, meta2.v FROM gdcat.ns.t " +
      "ORDER BY doc_id").collect()
    assert(rows(0).isNullAt(1) && rows(1).isNullAt(1), rows.mkString)
    assert(rows(2).getLong(1) == 9L,
      s"int-era meta2 payload misdecoded: ${rows(2)}") // the poison row
    assert(rows(3).getLong(1) == 6000000000L, rows(3).toString)
    assert(Files.exists(java.nio.file.Paths.get(path, "SCHEMA.gen-1")),
      "second widening must archive the meta2-INT era under gen 1")
  }

  test("r16: CDC readers refuse newer-generation segments instead of misdecoding") {
    // the batch scan fails loudly when a segment is stamped newer than
    // the planning schema (a concurrent widening landed); the CDC
    // reader factory must match — silently decoding 8-byte leaves
    // through a narrower captured schema corrupts values
    val base = DocStore.SCHEMA
    val fac = new graft.sources.DocStoreCdcReaderFactory(base, Map.empty)
    val newer = graft.sources.DocStoreCdcPartition(
      "/nonexistent/p.gds", "p.gds", Array.empty, Array.empty,
      "insert", 3L, schemaGen = 1L)
    val e = intercept[IllegalArgumentException] {
      fac.createReader(newer)
    }
    assert(e.getMessage.contains("newer"), e.getMessage)
    // an OLD generation with no archive on disk must also refuse
    // (decoding by the live schema would misparse narrower payloads)
    val mb = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(DocStore.NESTED_GEN_KEY, 2L)
    val gen2 = org.apache.spark.sql.types.StructType(base.fields :+
      org.apache.spark.sql.types.StructField("meta",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("w",
            org.apache.spark.sql.types.LongType))),
        nullable = true, metadata = mb.build()))
    val fac2 = new graft.sources.DocStoreCdcReaderFactory(gen2, Map.empty)
    val old = graft.sources.DocStoreCdcPartition(
      "/nonexistent/p.gds", "p.gds", Array.empty, Array.empty,
      "insert", 3L, schemaGen = 1L)
    val e2 = intercept[IllegalStateException] { fac2.createReader(old) }
    assert(e2.getMessage.contains("missing SCHEMA.gen-1"), e2.getMessage)
  }

  test("r14: -0.0 survives an evolved DOUBLE round-trip; zero filters stay sound") {
    // r13 ADVICE: the stored payload keeps the raw IEEE sign bit
    // (parquet/Delta/Iceberg fidelity); ONLY stats and filter literals
    // canonicalize ±0.0 so pruning and SQL's -0.0 == 0.0 agree.
    val root = Files.createTempDirectory("docstore_negzero").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.nzcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.nzcat.root" -> root)
    sc.sql("CREATE NAMESPACE nzcat.ns")
    sc.sql("CREATE TABLE nzcat.ns.z (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING)")
    sc.sql("ALTER TABLE nzcat.ns.z ADD COLUMNS (price DOUBLE)")
    // four single-row segments: -0.0, +0.0, negative, positive
    sc.sql("INSERT INTO nzcat.ns.z VALUES " +
      "(1, 1, 'en', 's', 'a', CAST('-0.0' AS DOUBLE))")
    sc.sql("INSERT INTO nzcat.ns.z VALUES (2, 2, 'en', 's', 'b', 0.0D)")
    sc.sql("INSERT INTO nzcat.ns.z VALUES (3, 3, 'en', 's', 'c', -1.5D)")
    sc.sql("INSERT INTO nzcat.ns.z VALUES (4, 4, 'en', 's', 'd', 2.5D)")
    // data fidelity: the sign is visible via CAST AS STRING and in the
    // collected IEEE bits (1/x would show ±Inf, but ANSI mode refuses
    // zero division, so read the sign bit directly)
    val reprs = sc.sql("SELECT doc_id, CAST(price AS STRING) AS r, " +
      "price FROM nzcat.ns.z ORDER BY doc_id").collect()
    assert(reprs(0).getString(1) == "-0.0", reprs(0).toString)
    assert(java.lang.Double.doubleToRawLongBits(reprs(0).getDouble(2)) < 0)
    assert(reprs(1).getString(1) == "0.0", reprs(1).toString)
    assert(java.lang.Double.doubleToRawLongBits(reprs(1).getDouble(2)) == 0L)
    // SQL equality: BOTH zero rows answer = 0.0 AND = -0.0 — the -0.0
    // segment's envelope must not be pruned by the +0.0 literal (and
    // vice versa), which is exactly what stat-boundary
    // canonicalization guarantees
    def ids(pred: String): Seq[Long] =
      sc.sql(s"SELECT doc_id FROM nzcat.ns.z WHERE $pred ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
    assert(ids("price = 0.0D") == Seq(1L, 2L))
    assert(ids("price = CAST('-0.0' AS DOUBLE)") == Seq(1L, 2L))
    assert(ids("price >= 0.0D") == Seq(1L, 2L, 4L))
    assert(ids("price < 0.0D") == Seq(3L))
    assert(ids("price <= 0.0D") == Seq(1L, 2L, 3L))
  }

  test("r13: GDS3 segment compression — property-gated, mixed magics, pruning intact") {
    val root = Files.createTempDirectory("docstore_zip").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.zcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.zcat.root" -> root)
    sc.sql("CREATE NAMESPACE zcat.ns")
    sc.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars", "lang", "source", "text")
      .createOrReplaceTempView("zip_src")
    // twin tables, same data: compression on vs off
    sc.sql("CREATE TABLE zcat.ns.z (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING) " +
      "TBLPROPERTIES ('graft.write.compression' = 'deflate')")
    sc.sql("CREATE TABLE zcat.ns.raw (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING)")
    Seq("z", "raw").foreach(t =>
      sc.sql(s"INSERT INTO zcat.ns.$t SELECT * FROM zip_src"))
    def bytesOf(t: String): Long = DocStore.readManifest(
      java.nio.file.Paths.get(root, "ns", t).toString).map(_.bytes).sum
    val (zb, rb) = (bytesOf("z"), bytesOf("raw"))
    assert(zb < rb, s"compressed $zb must be smaller than raw $rb")
    // the on-disk magic IS GDS3
    val zPath = java.nio.file.Paths.get(root, "ns", "z")
    val seg = DocStore.readManifest(zPath.toString).head.name
    val head = java.util.Arrays.copyOf(
      Files.readAllBytes(zPath.resolve(seg)), 4)
    assert(java.nio.ByteBuffer.wrap(head).getInt == DocStore.MAGIC3)
    // content round-trips exactly
    assert(sc.sql("SELECT * FROM zcat.ns.z").orderBy("doc_id").collect()
      .map(_.toSeq).toSeq ==
      docs.orderBy("doc_id").collect().map(_.toSeq).toSeq)
    // doc_id pushdown still prunes compressed segments off the manifest
    val plan = sc.sql("SELECT text FROM zcat.ns.z WHERE doc_id < 0")
      .queryExecution.executedPlan.toString
    assert("segments=0/".r.findFirstIn(plan).isDefined, plan)
    // property is write-time only: flipping to none mixes magics in one
    // table and reads stay seamless
    sc.sql("ALTER TABLE zcat.ns.z SET TBLPROPERTIES " +
      "('graft.write.compression' = 'none')")
    sc.sql("INSERT INTO zcat.ns.z SELECT doc_id + 1000000, n_chars, " +
      "lang, source, text FROM zip_src")
    assert(sc.sql("SELECT COUNT(*) FROM zcat.ns.z").head.getLong(0) ==
      2 * docs.count())
    assert(sc.sql("SELECT SUM(n_chars) FROM zcat.ns.z").head.getLong(0) ==
      2 * docs.agg(sum("n_chars")).head.getLong(0))
    // evolved columns ride GDS3 too (nSect > 5 under compression)
    sc.sql("ALTER TABLE zcat.ns.z SET TBLPROPERTIES " +
      "('graft.write.compression' = 'deflate')")
    sc.sql("ALTER TABLE zcat.ns.z ADD COLUMNS (price DOUBLE)")
    sc.sql("INSERT INTO zcat.ns.z VALUES " +
      "(9000000, 4, 'en', 's', 'zzz', -2.5D)")
    assert(sc.sql("SELECT price FROM zcat.ns.z WHERE doc_id = 9000000")
      .head.getDouble(0) == -2.5)
    // merge-on-read reinserts honor the property as well
    sc.sql("ALTER TABLE zcat.ns.z SET TBLPROPERTIES " +
      "('graft.rowlevel.mode' = 'merge-on-read')")
    sc.sql("UPDATE zcat.ns.z SET price = 7.25D WHERE doc_id = 9000000")
    assert(sc.sql("SELECT price FROM zcat.ns.z WHERE doc_id = 9000000")
      .head.getDouble(0) == 7.25)
    // streaming reads pace the mixed-magic table through the same
    // per-segment decoder: an exhaustive drain equals the batch face
    sc.catalog.dropTempView("zip_stream_test")
    val sq = sc.readStream.format("graft-docstore")
      .option("path", zPath.toString).load()
      .groupBy("lang").count()
      .writeStream.format("memory").queryName("zip_stream_test")
      .outputMode("complete").start()
    try sq.processAllAvailable() finally sq.stop()
    assert(sc.table("zip_stream_test").orderBy("lang").collect()
      .map(_.toSeq).toSeq ==
      sc.sql("SELECT lang, COUNT(*) FROM zcat.ns.z GROUP BY lang")
        .orderBy("lang").collect().map(_.toSeq).toSeq)
    // DDL validation refuses unknown codecs
    assert(intercept[Exception] {
      sc.sql("ALTER TABLE zcat.ns.z SET TBLPROPERTIES " +
        "('graft.write.compression' = 'zstd-banana')")
    }.getMessage.contains("graft.write.compression"))
  }

  test("r13: version-log checkpoint serves history/birth/times exactly, reconciles gaps") {
    val root = Files.createTempDirectory("docstore_ckpt").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.kp" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.kp.root" -> root)
    sc.sql("CREATE NAMESPACE kp.ns")
    sc.sql("CREATE TABLE kp.ns.t (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING)")
    (1 to 5).foreach(i => sc.sql(
      s"INSERT INTO kp.ns.t VALUES ($i, ${i * 10}, 'en', 's', 'd$i')"))
    sc.sql("DELETE FROM kp.ns.t WHERE doc_id = 3") // a DV/misaligned op
    val path = java.nio.file.Paths.get(root, "ns", "t")
    val ckptFile = path.resolve(graft.sources.DocStoreCommitOps.CHECKPOINT_FILE)
    assert(Files.exists(ckptFile), "every commit maintains the checkpoint")
    val ck = graft.sources.DocStoreCommitOps.readCheckpoint(path.toString)
    val vts = graft.sources.DocStoreCommitOps.versionTimes(path.toString)
    assert(ck.keySet == vts.map(_._1).toSet,
      s"checkpoint must cover every retained version: ${ck.keySet} vs $vts")
    // equivalence: history + _commit_version + times with the
    // checkpoint present == with it REMOVED (the pure fallback walk)
    def faces() = (
      sc.sql("CALL kp.system.history('ns.t')").collect()
        .map(_.toSeq).toSeq,
      sc.sql("SELECT doc_id, _commit_version FROM kp.ns.t")
        .collect().map(_.toSeq).toSeq.sortBy(_.head.toString),
      graft.sources.DocStoreCommitOps.versionTimes(path.toString))
    val withCkpt = faces()
    val saved = Files.readAllBytes(ckptFile)
    Files.delete(ckptFile)
    assert(faces() == withCkpt,
      "checkpoint-served faces must equal the full per-version walk")
    // crash tail: a checkpoint missing its NEWEST line (append died
    // after the manifest move) reconciles per-version, same answers
    Files.write(ckptFile, saved)
    val lines = new String(saved, "UTF-8").split("\n")
    Files.writeString(ckptFile, lines.init.mkString("\n"))
    assert(faces() == withCkpt, "a trailing gap must reconcile exactly")
    Files.write(ckptFile, saved)
    // expiry rebuilds the roll-up over the RETAINED set only
    sc.sql("CALL kp.system.expire_snapshots('ns.t', 3)")
    val ck2 = graft.sources.DocStoreCommitOps.readCheckpoint(path.toString)
    val vts2 = graft.sources.DocStoreCommitOps.versionTimes(path.toString)
    assert(ck2.keySet == vts2.map(_._1).toSet && ck2.size == 3,
      s"expire must rebuild the checkpoint: ${ck2.keySet}")
    val withCkpt2 = faces()
    Files.delete(ckptFile)
    assert(faces() == withCkpt2,
      "post-expiry roll-up must equal the direct walk")
    graft.sources.DocStoreCommitOps.rebuildCheckpoint(path.toString,
      vts2.map { case (v, t) =>
        val (segs, dvs) = DocStore.readManifestAndDeletes(
          path.toString, s"MANIFEST.v$v")
        (v, t, segs, dvs)
      })
    // vacuum resets history AND its summary
    sc.sql("CALL kp.system.vacuum('ns.t')")
    assert(!Files.exists(ckptFile),
      "history resets must drop the checkpoint")
    sc.sql("INSERT INTO kp.ns.t VALUES (9, 90, 'en', 's', 'd9')")
    assert(Files.exists(ckptFile), "the new era re-seeds the checkpoint")
  }

  test("r13: REPLACE WHERE swaps aligned doc_id windows atomically") {
    val root = Files.createTempDirectory("docstore_rw").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.rcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.rcat.root" -> root)
    sc.sql("CREATE NAMESPACE rcat.ns")
    sc.sql("CREATE TABLE rcat.ns.t (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING)")
    Seq((0, 10), (10, 20), (20, 30)).foreach { case (a, b) =>
      sc.sql(s"INSERT INTO rcat.ns.t SELECT id, id, 'en', 's', " +
        s"concat('d', id) FROM range($a, $b, 1, 1)") }
    val path = java.nio.file.Paths.get(root, "ns", "t").toString
    val headBefore = graft.sources.DocStoreCommitOps.nextVersion(path) - 1
    val replacedSegs = DocStore.readManifest(path)
      .filter(s => s.minId >= 10 && s.maxId <= 19).map(_.name)
    assert(replacedSegs.nonEmpty)
    // aligned window: covered segments swap for the written data in
    // ONE commit; everything else is untouched metadata
    sc.range(10, 15).selectExpr("id AS doc_id", "id AS n_chars",
      "'xx' AS lang", "'s' AS source", "concat('r', id) AS text")
      .coalesce(1)
      .writeTo("rcat.ns.t")
      .overwrite(col("doc_id") >= 10 && col("doc_id") <= 19)
    assert(sc.sql("SELECT COUNT(*) FROM rcat.ns.t").head.getLong(0) == 25)
    assert(sc.sql("SELECT COUNT(*) FROM rcat.ns.t WHERE lang = 'xx'")
      .head.getLong(0) == 5)
    // time travel still serves the pre-replace snapshot (files retained)
    assert(sc.sql("SELECT COUNT(*) FROM rcat.ns.t VERSION AS OF " +
      headBefore).head.getLong(0) == 30)
    replacedSegs.foreach(n => assert(
      Files.exists(java.nio.file.Paths.get(path, n)),
      s"replaced segment $n must stay on disk for time travel"))
    def msg(t: Throwable): String =
      Iterator.iterate(t: Throwable)(_.getCause).takeWhile(_ != null)
        .map(m => String.valueOf(m.getMessage)).mkString("|")
    // misaligned window refuses (replacement must be exact) and the
    // table is untouched
    val e1 = intercept[Exception] {
      sc.range(5, 8).selectExpr("id AS doc_id", "id AS n_chars",
        "'zz' AS lang", "'s' AS source", "'m' AS text").coalesce(1)
        .writeTo("rcat.ns.t")
        .overwrite(col("doc_id") >= 5 && col("doc_id") <= 12) }
    assert(msg(e1).contains("not segment-aligned"), msg(e1))
    assert(sc.sql("SELECT COUNT(*) FROM rcat.ns.t").head.getLong(0) == 25)
    // written rows outside the window refuse (Delta's replaceWhere
    // constraint check)
    val e2 = intercept[Exception] {
      sc.range(50, 52).selectExpr("id AS doc_id", "id AS n_chars",
        "'zz' AS lang", "'s' AS source", "'m' AS text").coalesce(1)
        .writeTo("rcat.ns.t")
        .overwrite(col("doc_id") >= 20 && col("doc_id") <= 29) }
    assert(msg(e2).contains("does not contain every written row"), msg(e2))
    assert(sc.sql("SELECT COUNT(*) FROM rcat.ns.t").head.getLong(0) == 25)
    // non-doc_id predicates refuse loudly at plan time
    val e3 = intercept[Exception] {
      sc.range(0, 1).selectExpr("id AS doc_id", "id AS n_chars",
        "'zz' AS lang", "'s' AS source", "'m' AS text")
        .writeTo("rcat.ns.t").overwrite(col("lang") === "en") }
    assert(msg(e3).contains("doc_id-bound"), msg(e3))
    // the SQL face: INSERT INTO ... REPLACE WHERE
    sc.sql("INSERT INTO rcat.ns.t REPLACE WHERE doc_id >= 20 AND " +
      "doc_id <= 29 SELECT id, id, 'yy', 's', concat('q', id) " +
      "FROM range(20, 23, 1, 1)")
    assert(sc.sql("SELECT COUNT(*) FROM rcat.ns.t").head.getLong(0) == 18)
    assert(sc.sql("SELECT COUNT(*) FROM rcat.ns.t WHERE lang = 'yy'")
      .head.getLong(0) == 3)
  }

  test("r14: DECIMAL(38,6) evolved columns — dec128 payloads, DecBound pruning, cross-18 widening") {
    val root = Files.createTempDirectory("docstore_dec38").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.dcat14" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.dcat14.root" -> root)
    sc.sql("CREATE NAMESPACE dcat14.ns")
    sc.sql("CREATE TABLE dcat14.ns.t (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING)")
    sc.sql("INSERT INTO dcat14.ns.t VALUES (1, 1, 'en', 's', 'pre')")
    sc.sql("ALTER TABLE dcat14.ns.t ADD COLUMNS (wide DECIMAL(38,6))")
    // one segment per insert: huge positive, huge negative, null
    val big = "99999999999999999999999999999999.999999" // 38 digits
    sc.sql(s"INSERT INTO dcat14.ns.t VALUES (2, 2, 'en', 's', 'a', $big)")
    sc.sql(s"INSERT INTO dcat14.ns.t VALUES (3, 3, 'en', 's', 'b', -$big)")
    sc.sql("INSERT INTO dcat14.ns.t VALUES (4, 4, 'en', 's', 'c', NULL)")
    sc.sql("INSERT INTO dcat14.ns.t VALUES (5, 5, 'en', 's', 'd', 1.000001)")
    val vals = sc.sql("SELECT wide FROM dcat14.ns.t ORDER BY doc_id")
      .collect().map(r => Option(r.getDecimal(0)).map(_.toString).orNull)
    assert(vals.toSeq == Seq(null, big, s"-$big", null, "1.000001"),
      vals.mkString(","))
    // ORDER BY over mixed sign magnitudes
    assert(sc.sql("SELECT doc_id FROM dcat14.ns.t " +
      "WHERE wide IS NOT NULL ORDER BY wide").collect()
      .map(_.getLong(0)).toSeq == Seq(3L, 5L, 2L))
    // DecBound segment pruning on executed plans: equality at the huge
    // positive keeps only its segment (+ the stat-less pre-evolution
    // segment, conservatively kept)
    val path = java.nio.file.Paths.get(root, "ns", "t").toString
    def readBack = sc.read.format("graft-docstore").option("path", path).load()
    def planned(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      val m = "segments=(\\d+)/(\\d+)".r.findFirstMatchIn(
        df.queryExecution.executedPlan.toString).get
      (m.group(1).toInt, m.group(2).toInt)
    }
    val eqBig = readBack.where(col("wide") === lit(new java.math.BigDecimal(big)))
    assert(planned(eqBig) == ((2, 5)), planned(eqBig).toString)
    assert(eqBig.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(2L))
    val gtZero = readBack.where(col("wide") > lit(java.math.BigDecimal.ZERO))
    assert(planned(gtZero) == ((3, 5)), planned(gtZero).toString)
    // MIN/MAX pushdown DECLINES while the pre-evolution segment has no
    // stats for the wide section (conservative, like every evolved
    // column) yet computes exactly through the data path; after
    // ANALYZE below it SERVES from the manifest
    val agg = readBack.agg(min("wide"), max("wide"))
    assert(!agg.queryExecution.executedPlan.toString
      .contains("manifest-only agg"),
      agg.queryExecution.executedPlan.toString)
    val mm = agg.head
    assert(mm.getDecimal(0).toString == s"-$big" &&
      mm.getDecimal(1).toString == big)
    // cross-18 widening: 8-byte history + 16-byte new values in ONE
    // column; aggregates span both payload classes
    sc.sql("CREATE TABLE dcat14.ns.w (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING)")
    sc.sql("ALTER TABLE dcat14.ns.w ADD COLUMNS (amt DECIMAL(12,2))")
    sc.sql("INSERT INTO dcat14.ns.w VALUES (1, 1, 'en', 's', 'x', 12.50)")
    sc.sql("ALTER TABLE dcat14.ns.w ALTER COLUMN amt TYPE DECIMAL(38,2)")
    sc.sql("INSERT INTO dcat14.ns.w VALUES " +
      "(2, 2, 'en', 's', 'y', 100000000000000000000.25)")
    val wvals = sc.sql("SELECT CAST(SUM(amt) AS DECIMAL(38,2)) AS s, " +
      "MIN(amt) AS lo, MAX(amt) AS hi FROM dcat14.ns.w").head
    assert(wvals.getDecimal(0).toString == "100000000000000000012.75")
    assert(wvals.getDecimal(1).toString == "12.50")
    assert(wvals.getDecimal(2).toString == "100000000000000000000.25")
    // the widened column's PRE-widening LongBound still prunes a
    // decimal literal (lifted comparison): amt = 12.50 keeps only the
    // 8-byte segment
    val wpath = java.nio.file.Paths.get(root, "ns", "w").toString
    val wBack = sc.read.format("graft-docstore").option("path", wpath).load()
    val eqSmall = wBack.where(col("amt") === lit(new java.math.BigDecimal("12.50")))
    assert(planned(eqSmall) == ((1, 2)), planned(eqSmall).toString)
    assert(eqSmall.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // CoW UPDATE re-encodes dec128 through the same writer
    sc.sql("UPDATE dcat14.ns.t SET wide = 2.000002 WHERE doc_id = 4")
    assert(sc.sql("SELECT wide FROM dcat14.ns.t WHERE doc_id = 4")
      .head.getDecimal(0).toString == "2.000002")
    // ANALYZE backfills DecBound on a stats-less wide column — and
    // marks the pre-evolution segment provably all-null, which makes
    // manifest-only MIN/MAX servable: the agg now folds DecBound
    // envelopes in exact 128-bit space, no segment opened
    sc.sql("CALL dcat14.system.analyze('ns.t')")
    val stats = DocStore.readManifest(path).flatMap(_.stats.get(5))
    assert(stats.exists(_.bound.exists(_.isInstanceOf[DocStore.DecBound])),
      stats.mkString(";"))
    val agg2 = readBack.agg(min("wide"), max("wide"))
    assert(agg2.queryExecution.executedPlan.toString
      .contains("manifest-only agg"),
      agg2.queryExecution.executedPlan.toString)
    val mm2 = agg2.head
    assert(mm2.getDecimal(0).toString == s"-$big" &&
      mm2.getDecimal(1).toString == big)
  }

  test("struct-leaf Bloom skipping: dotted point predicates skip segments; refusal matrix; MoR and ANALYZE carry") {
    val root = Files.createTempDirectory("docstore_leaf_bloom").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.lbcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.lbcat.root" -> root)
    sc.sql("CREATE NAMESPACE lbcat.ns")
    sc.sql("CREATE TABLE lbcat.ns.t (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING)")
    sc.sql("ALTER TABLE lbcat.ns.t ADD COLUMNS " +
      "(meta STRUCT<fp: STRING, day: BIGINT>)")
    // the spec names LEAF paths; validation resolves them against the
    // evolved schema with the top-level eligibility rules
    sc.sql("ALTER TABLE lbcat.ns.t SET TBLPROPERTIES " +
      "('graft.bloom.columns' = 'meta.fp,meta.day')")
    sc.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars"), col("lang"),
        col("source"), col("text"),
        struct(md5(col("text")).as("fp"),
          (col("doc_id") * 37 % 1000).as("day")).as("meta"))
      .createOrReplaceTempView("lb_src")
    // id-striped commits: each segment's LEAF envelopes span the hex
    // domain / the day range — only the leaf Blooms can skip
    (0 to 3).foreach(k => sc.sql("INSERT INTO lbcat.ns.t " +
      s"SELECT * FROM lb_src WHERE doc_id % 4 = $k"))
    def keptOf(df: DataFrame): (Int, Int) = {
      val m = "segments=(\\d+)/(\\d+)".r
        .findFirstMatchIn(physical(df)).getOrElse(
          fail(s"no segment count in plan:\n${physical(df)}"))
      (m.group(1).toInt, m.group(2).toInt)
    }
    // string leaf probe
    val fp = docs.where(col("doc_id") === 42)
      .select(md5(col("text"))).head().getString(0)
    val q1 = sc.sql(s"SELECT doc_id FROM lbcat.ns.t WHERE meta.fp = '$fp'")
    val (k1, n1) = keptOf(q1)
    assert(n1 == 4 && k1 < n1,
      s"string leaf bloom must skip segments, read $k1/$n1:\n${physical(q1)}")
    assert(q1.collect().map(_.getLong(0)).toSeq == Seq(42L))
    // long leaf probe (day is unique per doc_id under the 37-multiplier)
    val q2 = sc.sql("SELECT doc_id FROM lbcat.ns.t " +
      s"WHERE meta.day = ${42L * 37 % 1000}")
    val (k2, _) = keptOf(q2)
    assert(k2 < 4, s"long leaf bloom must skip, read $k2/4")
    assert(q2.collect().map(_.getLong(0)).toSeq == Seq(42L))
    // definite absence proves ~all segments empty
    val q3 = sc.sql(
      "SELECT doc_id FROM lbcat.ns.t WHERE meta.fp = 'not-a-real-hash'")
    assert(keptOf(q3)._1 <= 1, s"absent leaf value should skip ~all")
    assert(q3.count() == 0)
    // NO FALSE NEGATIVES at corpus scale: one IN-list of EVERY stored
    // fingerprint must return every row — a filter that missed even
    // one fold would silently lose rows here
    val allFps = docs.select(md5(col("text"))).distinct()
      .collect().map(_.getString(0))
    val qAll = sc.sql("SELECT COUNT(*) FROM lbcat.ns.t WHERE meta.fp IN " +
      allFps.map(f => s"'$f'").mkString("(", ",", ")"))
    assert(qAll.head().getLong(0) == docs.count(),
      "leaf bloom produced a false negative (row loss)")
    // OPTIMIZE regenerates leaf blooms for the packed segments
    sc.sql("CALL lbcat.system.optimize('ns.t', 2)")
    val q5 = sc.sql(s"SELECT doc_id FROM lbcat.ns.t WHERE meta.fp = '$fp'")
    val (k5, n5) = keptOf(q5)
    assert(n5 == 2 && k5 == 1,
      s"post-OPTIMIZE leaf bloom must prune, read $k5/$n5")
    assert(q5.collect().map(_.getLong(0)).toSeq == Seq(42L))
    // ---- refusal matrix (r16 verdict item 3: DDL refuses loudly)
    sc.sql("CREATE TABLE lbcat.ns.bad (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING)")
    sc.sql("ALTER TABLE lbcat.ns.bad ADD COLUMNS " +
      "(m STRUCT<score: DOUBLE, tags: ARRAY<BIGINT>, " +
      "inner: STRUCT<w: BIGINT>>, arr ARRAY<STRUCT<x: BIGINT>>)")
    def refuses(spec: String, needle: String): Unit = {
      val e = intercept[Exception] {
        sc.sql("ALTER TABLE lbcat.ns.bad SET TBLPROPERTIES " +
          s"('graft.bloom.columns' = '$spec')")
      }
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
      assert(msg.contains(needle),
        s"expected refusal containing '$needle' for spec '$spec', got: $e")
    }
    refuses("m.score", "decline")            // float leaf
    refuses("m.tags", "ARRAY")               // the leaf IS an array
    refuses("arr.x", "ARRAY")                // path traverses an array
    refuses("m.inner.nope", "no field named") // unknown nested leaf
    refuses("m.nope", "no field")            // unknown leaf
    refuses("nosuch.fp", "unknown column")   // unknown root
    // deep struct leaf is fine
    sc.sql("ALTER TABLE lbcat.ns.bad SET TBLPROPERTIES " +
      "('graft.bloom.columns' = 'm.inner.w')")
    // the ROOT of a leaf entry cannot be dropped or renamed from
    // under the property
    assert(intercept[Exception] {
      sc.sql("ALTER TABLE lbcat.ns.bad DROP COLUMN m")
    }.getMessage.contains("Bloom-indexed"))
    assert(intercept[Exception] {
      sc.sql("ALTER TABLE lbcat.ns.bad RENAME COLUMN m TO m2")
    }.getMessage.contains("Bloom-indexed"))
    // ---- merge-on-read insert segments carry leaf blooms (r16
    // advice: the delta commit used to drop them silently)
    sc.sql("CREATE TABLE lbcat.ns.mor (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING) " +
      "TBLPROPERTIES ('graft.rowlevel.mode' = 'merge-on-read')")
    sc.sql("ALTER TABLE lbcat.ns.mor ADD COLUMNS " +
      "(meta STRUCT<fp: STRING, day: BIGINT>)")
    sc.sql("ALTER TABLE lbcat.ns.mor SET TBLPROPERTIES " +
      "('graft.bloom.columns' = 'meta.fp')")
    sc.sql("INSERT INTO lbcat.ns.mor " +
      "SELECT * FROM lb_src WHERE doc_id < 250")
    sc.sql("MERGE INTO lbcat.ns.mor t USING " +
      "(SELECT * FROM lb_src WHERE doc_id >= 250) s ON t.doc_id = s.doc_id " +
      "WHEN NOT MATCHED THEN INSERT *")
    val morPath = java.nio.file.Paths.get(root, "ns", "mor").toString
    val morSegs = DocStore.readManifestAndDeletes(morPath)._1
    assert(morSegs.size >= 2, s"expected batch + MoR segments: $morSegs")
    assert(morSegs.forall(_.leafBlooms.get(5).exists(_.contains("fp"))),
      s"every segment (incl. MoR-inserted) must carry the meta.fp " +
        s"bloom: ${morSegs.map(s => s.name -> s.leafBlooms.keySet)}")
    // ---- ANALYZE backfills LEAF blooms onto pre-property segments
    sc.sql("CREATE TABLE lbcat.ns.bf (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING)")
    sc.sql("ALTER TABLE lbcat.ns.bf ADD COLUMNS " +
      "(meta STRUCT<fp: STRING, day: BIGINT>)")
    (0 to 3).foreach(k => sc.sql("INSERT INTO lbcat.ns.bf " +
      s"SELECT * FROM lb_src WHERE doc_id % 4 = $k"))
    sc.sql("ALTER TABLE lbcat.ns.bf SET TBLPROPERTIES " +
      "('graft.bloom.columns' = 'meta.fp')")
    def bfProbe = sc.sql(
      s"SELECT doc_id FROM lbcat.ns.bf WHERE meta.fp = '$fp'")
    val (kb0, nb0) = keptOf(bfProbe)
    assert(nb0 == 4 && kb0 == 4,
      s"pre-analyze segments carry no leaf blooms; got $kb0/$nb0")
    val bfPath = java.nio.file.Paths.get(root, "ns", "bf").toString
    val bfNames =
      DocStore.readManifestAndDeletes(bfPath)._1.map(_.name).toSet
    sc.sql("CALL lbcat.system.analyze('ns.bf')")
    assert(DocStore.readManifestAndDeletes(bfPath)._1
      .map(_.name).toSet == bfNames,
      "analyze must backfill metadata only — no segment rewritten")
    val (kb1, nb1) = keptOf(bfProbe)
    assert(nb1 == 4 && kb1 < 4,
      s"post-analyze leaf blooms must skip, got $kb1/$nb1")
    assert(bfProbe.collect().map(_.getLong(0)).toSeq == Seq(42L))
    // ---- row-level DML group pruning consults leaf blooms too: an
    // UPDATE keyed on the nested fingerprint rewrites only the
    // stripe(s) that might hold it (statsPruner is shared, so this
    // follows from the read-path support — pinned because a rewrite
    // of all 4 stripes is the silent cost bug the pin exists to catch)
    val fp2 = docs.where(col("doc_id") === 43)
      .select(md5(col("text"))).head().getString(0)
    val stripesWithFp2 = docs
      .filter(md5(col("text")) === fp2)
      .select(pmod(col("doc_id"), lit(4))).distinct().count()
    val bfNames2 =
      DocStore.readManifestAndDeletes(bfPath)._1.map(_.name).toSet
    sc.sql(s"UPDATE lbcat.ns.bf SET lang = 'xx' WHERE meta.fp = '$fp2'")
    val rewritten = bfNames2 --
      DocStore.readManifestAndDeletes(bfPath)._1.map(_.name).toSet
    // tolerate bloom FALSE POSITIVES (a re-seeded corpus can hit one,
    // and an FP-kept stripe is scanned and therefore rewritten by the
    // group-based CoW) — the pin is that pruning happened at all
    assert(rewritten.size.toLong >= stripesWithFp2 &&
      rewritten.size.toLong <= stripesWithFp2 + 1,
      s"UPDATE on meta.fp must rewrite the $stripesWithFp2 stripe(s) " +
        s"holding it (+at most one bloom FP): rewrote ${rewritten.size}")
    assert(sc.sql("SELECT COUNT(*) FROM lbcat.ns.bf " +
      s"WHERE lang = 'xx'").head().getLong(0) ==
      docs.filter(md5(col("text")) === fp2).count())
  }

  test("analyze declines TIMESTAMP_NTZ bloom targets but still backfills the rest") {
    // r17 review regression pin: the leaf-target refactor briefly
    // scoped the NTZ decline to leaf paths only, so a top-level
    // TIMESTAMP_NTZ bloom column crashed the WHOLE analyze on the
    // refused TIMESTAMP_NTZ -> BIGINT cast (stats backfill included)
    val root = Files.createTempDirectory("docstore_bloom_ntz").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.bntz" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.bntz.root" -> root)
    sc.sql("CREATE NAMESPACE bntz.ns")
    sc.sql("CREATE TABLE bntz.ns.t (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING)")
    sc.sql("ALTER TABLE bntz.ns.t ADD COLUMNS (tnz TIMESTAMP_NTZ)")
    sc.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars"), col("lang"),
        md5(col("text")).as("source"), col("text"),
        lit("2020-01-01 00:00:00").cast("timestamp_ntz").as("tnz"))
      .createOrReplaceTempView("bntz_src")
    (0 to 3).foreach(k => sc.sql("INSERT INTO bntz.ns.t " +
      s"SELECT * FROM bntz_src WHERE doc_id % 4 = $k"))
    sc.sql("ALTER TABLE bntz.ns.t SET TBLPROPERTIES " +
      "('graft.bloom.columns' = 'source,tnz')")
    sc.sql("CALL bntz.system.analyze('ns.t')") // must not throw
    val fp = docs.where(col("doc_id") === 42)
      .select(md5(col("text"))).head().getString(0)
    val probe = sc.sql(
      s"SELECT doc_id FROM bntz.ns.t WHERE source = '$fp'")
    val m = "segments=(\\d+)/(\\d+)".r
      .findFirstMatchIn(physical(probe)).get
    assert(m.group(2).toInt == 4 && m.group(1).toInt < 4,
      s"analyze must still backfill the eligible source bloom: " +
        s"${m.group(1)}/${m.group(2)}")
    assert(probe.collect().map(_.getLong(0)).toSeq == Seq(42L))
  }

  test("retention DELETE through struct-leaf envelopes: aligned drops metadata-only, misaligned and inexact fall back") {
    val root = Files.createTempDirectory("docstore_leaf_ret").toString
    val sc = graft.core.Sessions.scoped(spark,
      "spark.sql.catalog.lrcat" ->
        classOf[graft.sources.DocStoreCatalog].getName,
      "spark.sql.catalog.lrcat.root" -> root)
    sc.sql("CREATE NAMESPACE lrcat.ns")
    sc.sql("CREATE TABLE lrcat.ns.t (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING)")
    sc.sql("ALTER TABLE lrcat.ns.t ADD COLUMNS " +
      "(meta STRUCT<day: BIGINT, tag: STRING>)")
    sc.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars"), col("lang"),
        col("source"), col("text"),
        struct(col("n_chars").as("day"),
          col("lang").as("tag")).as("meta"))
      .createOrReplaceTempView("lr_src")
    Seq("n_chars < 200", "n_chars BETWEEN 200 AND 399",
      "n_chars >= 400").foreach(band => sc.sql(
      "INSERT INTO lrcat.ns.t SELECT * FROM lr_src " +
        s"WHERE n_chars IS NOT NULL AND $band"))
    val path = java.nio.file.Paths.get(root, "ns", "t").toString
    def names: Set[String] =
      DocStore.readManifestAndDeletes(path)._1.map(_.name).toSet
    val pre = names
    val expectSurvivors = docs.filter(col("n_chars") >= 400).count()
    // ALIGNED leaf cutoff: every segment provably all-match or
    // matchless on its EXACT leaf LongBound — drops are manifest-only
    sc.sql("DELETE FROM lrcat.ns.t WHERE meta.day < 400")
    val post = names
    assert(post.subsetOf(pre) && post.nonEmpty && post.size < pre.size,
      s"aligned leaf DELETE must drop metadata-only: pre=$pre post=$post")
    assert(sc.sql("SELECT COUNT(*) FROM lrcat.ns.t")
      .head().getLong(0) == expectSurvivors)
    // MISALIGNED cutoff (mid-band): the survivor band is neither
    // all-match nor matchless — falls back to the exact rewrite
    // (a NEW segment name appears)
    val before2 = names
    sc.sql("DELETE FROM lrcat.ns.t WHERE meta.day < 450")
    val after2 = names
    assert((after2 -- before2).nonEmpty,
      s"misaligned leaf DELETE must rewrite: $before2 -> $after2")
    assert(sc.sql("SELECT MIN(meta.day) FROM lrcat.ns.t")
      .head().getLong(0) >= 450L)
    // STRING leaf predicates honestly decline the metadata path
    // (truncated bounds are not exact): rewrite, not manifest edit —
    // and the result is still correct
    val tag = sc.sql("SELECT meta.tag FROM lrcat.ns.t LIMIT 1")
      .head().getString(0)
    val before3 = names
    val expect3 = sc.sql("SELECT COUNT(*) FROM lrcat.ns.t " +
      s"WHERE NOT (meta.tag = '$tag')").head().getLong(0)
    sc.sql(s"DELETE FROM lrcat.ns.t WHERE meta.tag = '$tag'")
    assert(sc.sql("SELECT COUNT(*) FROM lrcat.ns.t")
      .head().getLong(0) == expect3)
    assert((names -- before3).nonEmpty || expect3 == 0L,
      "string-leaf DELETE must take the exact rewrite path")
  }
}
