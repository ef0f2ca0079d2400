package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Streaming change data feed — Delta's `readChangeFeed` streaming
  * read: `spark.readStream.format("graft-docstore").option("path", p)
  * .option("readChangeFeed", "true")[.option("startingVersion", n)]`
  * emits each commit's change rows (the [[DocStoreCdf]] snapshot-diff
  * semantics) as its own micro-batch, paced ONE VERSION PER BATCH
  * through the admission-control API so `_commit_version` is exact
  * per emitted row and a restart resumes from the checkpointed
  * version with no re-reads. Offsets are version numbers — the
  * natural name-stable key (versions are append-only; segments names
  * inside them are immutable), so no DELETE can shift a checkpoint.
  *
  * Per batch the planner diffs two retained manifests driver-side
  * (metadata) and ships only the touched segments: added segments as
  * 'insert' partitions, removed segments (read with their
  * predecessor's deletion vectors) as 'delete' partitions, and the
  * DV delta on common segments as emit-only-these-positions 'delete'
  * partitions. Unchanged files are never opened — the incremental
  * consumer at 100 TB reads each commit's touched bytes, not the
  * table. Restored-away history (vacuum) fails the stream LOUDLY
  * rather than skipping versions. */
object DocStoreCdcStream {
  val CHANGE_TYPE = "_change_type"
  val COMMIT_VERSION = "_commit_version"

  def cdcSchema(base: StructType): StructType =
    StructType(base.fields.toSeq ++ Seq(
      StructField(CHANGE_TYPE, StringType, nullable = false),
      StructField(COMMIT_VERSION, LongType, nullable = false)))
}

final case class DocStoreVersionOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

/** One CDC unit of work: one segment file read under one change role.
  * `skip` = positions dead BEFORE this commit (never change rows);
  * `emit` = when non-null, ONLY these positions are change rows (the
  * deletion-vector delta of this commit). */
final case class DocStoreCdcPartition(file: String, segName: String,
    skip: Array[Long], emit: Array[Long],
    changeType: String, version: Long,
    schemaGen: Long = 0L) extends InputPartition

/** Shared per-version partition planning — the ONE classification both
  * CDC faces ship to executors, so batch == stream structurally. A
  * `dataChange=false` rewrite commit (history-preserving OPTIMIZE)
  * plans nothing, exactly like Delta CDC crossing an OPTIMIZE. */
object DocStoreCdcPlanner {
  def planVersions(path: String, fromV: Long,
      toV: Long): Array[InputPartition] = {
    val dir = java.nio.file.Paths.get(path)
    (fromV + 1 to toV).flatMap { ver =>
      if (DocStoreCommitOps.isRewriteCommit(path, ver))
        Seq.empty[InputPartition]
      else {
        val (added, removed, fromDv, toDv, dvDelta, dvUndelta) =
          DocStoreCdf.snapshotDiff(path, ver - 1, ver)
        val inserts = added.map(s =>
          DocStoreCdcPartition(dir.resolve(s.name).toString, s.name,
            toDv.getOrElse(s.name, Array.empty), null, "insert", ver,
            s.schemaGen))
        val removes = removed.map(s =>
          DocStoreCdcPartition(dir.resolve(s.name).toString, s.name,
            fromDv.getOrElse(s.name, Array.empty), null, "delete", ver,
            s.schemaGen))
        val dvDeletes = dvDelta.map { case (seg, delta) =>
          DocStoreCdcPartition(dir.resolve(seg.name).toString, seg.name,
            Array.empty, delta, "delete", ver, seg.schemaGen)
        }
        // reinstated positions (system.restore across a MoR DELETE
        // republishes the smaller pre-delete vector) re-enter the
        // feed as emit-only-these-positions 'insert' partitions —
        // without them every CDC consumer silently missed un-deletes
        val dvInserts = dvUndelta.map { case (seg, und) =>
          DocStoreCdcPartition(dir.resolve(seg.name).toString, seg.name,
            Array.empty, und, "insert", ver, seg.schemaGen)
        }
        inserts ++ removes ++ dvDeletes ++ dvInserts
      }
    }.toArray
  }
}

/** The CDC face of the connector, batch AND streaming (Delta's
  * `readChangeFeed`): batch reads serve `table_changes(from, to)`
  * directly through the DataFrame reader — `startingVersion` inclusive
  * (default: the full history) to `endingVersion` (default: the
  * current head) — planning the same per-commit partitions the stream
  * paces one version at a time. */
class DocStoreCdcTable(path: String, startingVersion: Long,
    endingVersion: Option[Long] = None)
    extends Table with SupportsRead {
  private lazy val base = DocStore.tableSchema(path)
  override def name(): String = s"graft-docstore-cdc(`$path`)"
  override def schema(): StructType = DocStoreCdcStream.cdcSchema(base)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema()
        override def toBatch: org.apache.spark.sql.connector.read.Batch =
          new org.apache.spark.sql.connector.read.Batch {
            override def planInputPartitions(): Array[InputPartition] = {
              val head = DocStoreCommitOps.nextVersion(path) - 1
              val to = endingVersion.getOrElse(head)
              val from = math.max(1L, startingVersion) - 1
              require(to <= head,
                s"endingVersion $to is beyond table head $head")
              require(startingVersion <= head + 1,
                s"startingVersion $startingVersion is beyond table " +
                  s"head $head (+1)")
              // an inverted window is a consumer bug, never an empty
              // feed — a typo'd window reading zero rows would be
              // mistaken for "no changes" (Delta refuses too)
              require(startingVersion <= to,
                s"startingVersion $startingVersion is greater than " +
                  s"endingVersion $to — inverted CDF window")
              DocStoreCdcPlanner.planVersions(path, from, to)
            }
            override def createReaderFactory(): PartitionReaderFactory =
              new DocStoreCdcReaderFactory(base,
                DocStoreScan.allGenWriteTypes(path))
          }
        override def toMicroBatchStream(loc: String): MicroBatchStream = {
          // a stream has no end: silently ignoring a requested upper
          // bound would deliver out-of-window changes forever
          require(endingVersion.isEmpty,
            "endingVersion/endingTimestamp are BATCH change-feed " +
              "options — a CDC stream has no end; bound the consumer " +
              "or stop the query instead")
          new DocStoreCdcMicroBatchStream(path, base, startingVersion)
        }
        override def description(): String = name()
      }
    }
}

class DocStoreCdcMicroBatchStream(path: String, base: StructType,
    startingVersion: Long)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private def currentVersion: Long = DocStoreCommitOps.nextVersion(path) - 1

  /** Same rationale as [[DocStoreMicroBatchStream]]: without this
    * trait Spark's AvailableNow wrapper captures ONE pacing step as
    * the terminal offset and under-drains the paced source. */
  override def prepareForTriggerAvailableNow(): Unit = ()

  /** Delta's `startingVersion` is INCLUSIVE — the first batch delivers
    * that version's changes. Offsets store the last PROCESSED version;
    * version 0 is the empty pre-publish table, so the floor is 1.
    * A startingVersion beyond the table head fails LOUDLY here (as
    * Delta does) instead of silently streaming versions below it. */
  override def initialOffset(): Offset = {
    val head = currentVersion
    require(startingVersion <= head + 1,
      s"startingVersion $startingVersion is beyond table head $head " +
        s"(+1): refusing to start a CDC stream that could only ever " +
        s"deliver versions below the one requested")
    DocStoreVersionOffset(math.max(1L, startingVersion) - 1)
  }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  private def v(o: Offset): Long = o match {
    case null => math.max(1L, startingVersion) - 1
    case DocStoreVersionOffset(n) => n
    case other => v(deserializeOffset(other.json()))
  }

  // one committed version per micro-batch: _commit_version stays exact
  // and each batch's cost is one commit's touched segments; never
  // regress below start even if start somehow exceeds the head (a
  // regressed offset would commit and later stream versions BELOW the
  // requested startingVersion)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    DocStoreVersionOffset(
      math.max(v(start), math.min(currentVersion, v(start) + 1)))
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "docstore CDC paces batches via latestOffset(start, limit)")
  override def reportLatestOffset(): Offset =
    DocStoreVersionOffset(currentVersion)

  override def deserializeOffset(json: String): Offset =
    "\"version\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(json)
      .map(m => DocStoreVersionOffset(m.group(1).toLong))
      .getOrElse(throw new IllegalStateException(
        s"unparseable docstore CDC offset: $json"))

  /** One commit's partitions come straight from the SHARED
    * [[DocStoreCdcPlanner]] / [[DocStoreCdf.snapshotDiff]]
    * classification — stream == batch by construction, not by
    * parallel implementations. */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    DocStoreCdcPlanner.planVersions(path, v(start), v(end))

  override def createReaderFactory(): PartitionReaderFactory =
    new DocStoreCdcReaderFactory(base,
      DocStoreScan.allGenWriteTypes(path))
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class DocStoreCdcReaderFactory(base: StructType,
    genWriteTypes: Map[Long, Map[Int,
      org.apache.spark.sql.types.DataType]] = Map.empty)
    extends PartitionReaderFactory {
  // the generation this factory's captured schema decodes natively —
  // the CDC twin of DocStoreScan.genWriteTypes' liveGen guard
  private val captureGen = DocStore.nestedGenOf(base)
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[DocStoreCdcPartition]
    // a segment stamped NEWER than the captured schema means a
    // concurrent nested widening landed: its leaves are wider than
    // this reader's emit types, and narrowing is not value-exact —
    // refuse loudly exactly like the batch scan (silently decoding
    // 8-byte leaves through a 4-byte schema corrupts values)
    require(part.schemaGen <= captureGen,
      s"change-feed segment written under nested-codec generation " +
        s"${part.schemaGen}, newer than this reader's schema " +
        s"(generation $captureGen) — a concurrent nested widening " +
        "landed; restart the stream / re-run the batch read")
    // an OLD generation must resolve through its archive; decoding by
    // the live schema would misparse narrower-era payload bytes
    val types =
      if (part.schemaGen == captureGen)
        Map.empty[Int, org.apache.spark.sql.types.DataType]
      else genWriteTypes.getOrElse(part.schemaGen,
        throw new IllegalStateException(
          s"missing SCHEMA.gen-${part.schemaGen} archive — cannot " +
            s"decode generation-${part.schemaGen} nested payloads"))
    new DocStoreCdcReader(part, base, types)
  }
}

/** Wraps the plain segment reader: reads base columns + `_pos`, filters
  * to the emit set when present, and appends the constant change
  * columns. */
class DocStoreCdcReader(p: DocStoreCdcPartition, base: StructType,
    nestedWriteTypes: Map[Int,
      org.apache.spark.sql.types.DataType] = Map.empty)
    extends PartitionReader[InternalRow] {
  private val withPos = StructType(base.fields.toSeq :+
    StructField(PosMetadataColumn.NAME, LongType, nullable = false))
  private val inner = new DocStoreReader(p.file, base, withPos,
    Long.MinValue, Long.MaxValue, Int.MaxValue, p.skip, p.segName,
    null, nestedWriteTypes)
  private val emitSet: java.util.HashSet[Long] =
    if (p.emit == null) null
    else { val s = new java.util.HashSet[Long](); p.emit.foreach(s.add); s }
  private val posIdx = base.length
  private val typUtf = UTF8String.fromString(p.changeType)
  private var row: InternalRow = _

  override def next(): Boolean = {
    while (inner.next()) {
      val r = inner.get()
      if (emitSet == null || emitSet.contains(r.getLong(posIdx))) {
        val out = new Array[Any](base.length + 2)
        var i = 0
        while (i < base.length) {
          out(i) = if (r.isNullAt(i)) null else r.get(i, base(i).dataType)
          i += 1
        }
        out(base.length) = typUtf
        out(base.length + 1) = p.version
        row = new GenericInternalRow(out)
        return true
      }
    }
    false
  }
  override def get(): InternalRow = row
  override def close(): Unit = inner.close()
}
