package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, EqualTo, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Copy-on-write row-level operations (UPDATE / MERGE / misaligned
  * DELETE) for docstore tables — the `SupportsRowLevelOperations`
  * surface Delta and Iceberg plug Spark's UPDATE/MERGE SQL into.
  *
  * Group-based (copy-on-write) semantics, where a "group" is one
  * segment file: Spark scans the affected groups IN FULL, computes the
  * post-operation content of those groups (matched rows updated or
  * dropped, unmatched rows copied through, MERGE-inserted rows
  * appended), and hands the result to the write, which atomically
  * swaps the scanned segments for the rewritten ones in the manifest.
  * Unscanned segments are untouched metadata — at 100 TB an UPDATE
  * confined to one doc_id range rewrites only the segments
  * intersecting it, which is exactly Delta's copy-on-write cost model.
  *
  * Three contract points the implementation must honor:
  *  - the scan treats the command's condition as a GROUP-pruning hint
  *    only — every filter is returned as residual and no row is
  *    dropped, because unmatched rows of an affected segment must flow
  *    through the rewrite (the base scan's row-exact residual
  *    evaluation would silently DELETE them);
  *  - the replaced-segment set is whatever the scan actually PLANNED
  *    (after static + runtime group pruning) — the operation instance
  *    carries it from `planInputPartitions` to the write's commit,
  *    both driver-side;
  *  - the swap commits under the manifest lock and retains replaced
  *    files on disk, so `VERSION AS OF` snapshots taken before the
  *    UPDATE still read (append/DELETE/UPDATE history is preserved;
  *    only truncating overwrites reclaim space).
  *
  * Runtime group filtering: the scan implements
  * `SupportsRuntimeV2Filtering`, so Spark's
  * RowLevelOperationRuntimeGroupFiltering can run the matched-row
  * subquery FIRST and hand the observed doc_id set here, shrinking the
  * rewrite to the segments that actually contain matches — the same
  * dynamic pruning the read path does, applied to writes. */
class DocStoreRowLevelOperation(path: String, cmd: Command)
    extends RowLevelOperation {

  /** Segment names the scan planned — i.e. the groups being replaced.
    * Written by [[DocStoreRowLevelScan.planInputPartitions]] (driver),
    * read by [[DocStoreReplaceDataWrite.commit]] (driver).
    * graft-visible so the conflict-detection spec can stage one. */
  @volatile private[graft] var scannedSegments: Seq[String] = Seq.empty

  override def command(): Command = cmd

  /** `_segment` routes ReplaceData through Spark's PROJECTING write
    * task: with no metadata attribute the engine hands the writer the
    * raw rewrite output — `__row_operation` marker first — and the
    * table columns land shifted by one (observed as every doc_id
    * written as the marker constant before this was declared). */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(SegmentMetadataColumn.NAME))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocStoreRowLevelScanBuilder(path, this)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val schema = DocStore.tableSchema(path)
    val in = info.schema()
    val expect = schema.fields.map(f => f.name -> f.dataType).toMap
    require(in.fields.length == expect.size &&
      in.fields.forall(f => expect.get(f.name).contains(f.dataType)),
      s"row-level write schema must be ${schema.simpleString}, " +
        s"got ${in.simpleString}")
    val order = schema.fields.map(f => in.fieldIndex(f.name))
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new DocStoreReplaceDataWrite(path, schema, order, info.queryId(),
            DocStoreRowLevelOperation.this)
      }
    }
  }

  override def description(): String = s"GraftDocStore $cmd (copy-on-write)"
}

/** Filters prune SEGMENTS only — everything is residual, no row is
  * dropped (see the class doc of [[DocStoreRowLevelOperation]]). */
class DocStoreRowLevelScanBuilder(path: String,
    op: DocStoreRowLevelOperation)
    extends ScanBuilder with SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {

  private var lo = Long.MinValue
  private var hi = Long.MaxValue
  private val schema = DocStore.tableSchema(path)
  // data columns + the _segment metadata column the operation requires
  private var required: StructType = schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Conservative [lo, hi] from top-level doc_id conjuncts via the
    * shared [[DocStore.tightenDocIdBound]] (incl. the Long-extreme
    * wrap guards). Unrecognized filters narrow nothing (they might
    * match anywhere). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    filters.foreach { f =>
      DocStore.tightenDocIdBound(f, lo, hi).foreach { case (l, h) =>
        lo = l; hi = h
      }
    }
    filters // ALL residual: the rewrite plan re-evaluates the condition
  }
  override def pushedFilters(): Array[Filter] = Array.empty

  override def build(): Scan = {
    val segments = DocStore.readManifest(path)
    new DocStoreRowLevelScan(path, schema, required,
      segments.filter(s => s.maxId >= lo && s.minId <= hi),
      segments.size, op)
  }
}

class DocStoreRowLevelScan(path: String, schema: StructType,
    required: StructType,
    surviving: Seq[DocStore.Segment], total: Int,
    op: DocStoreRowLevelOperation)
    extends Scan with Batch with SupportsRuntimeV2Filtering {

  @volatile private var runtimeSurviving: Seq[DocStore.Segment] = surviving

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("doc_id"))

  /** Best-effort group narrowing from the runtime matched-row doc_id
    * set (an IN predicate fed by the group-filter subquery). Parsing
    * is all-or-nothing per predicate: a partially-understood IN must
    * not narrow (dropping a segment that contains matches would
    * silently skip its rewrite). */
  override def filter(predicates: Array[Predicate]): Unit = {
    predicates.foreach { p =>
      if (p.name() == "IN" && p.children().nonEmpty) {
        val isDocId = p.children()(0) match {
          case r: NamedReference => r.fieldNames.sameElements(Array("doc_id"))
          case _ => false
        }
        // flatMap, not a partial match on the value: a non-numeric or
        // null literal must DECLINE narrowing (ids falls short of the
        // child count), never throw MatchError at planning time
        val ids = p.children().drop(1).flatMap {
          case l: Literal[_] => l.value() match {
            case n: java.lang.Number => Some(n.longValue())
            case _ => None
          }
          case _ => None
        }
        if (isDocId && ids.length == p.children().length - 1)
          runtimeSurviving = runtimeSurviving.filter(s =>
            ids.exists(id => id >= s.minId && id <= s.maxId))
      }
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    op.scannedSegments = runtimeSurviving.map(_.name)
    runtimeSurviving.map(s => DocStorePartition(
      Paths.get(path, s.name).toString): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocStoreReaderFactory(schema, required,
      Long.MinValue, Long.MaxValue, Int.MaxValue)

  override def description(): String =
    s"GraftDocStore row-level segments=${surviving.size}/$total (full rows)"
}

/** Commit = swap the scanned segments for the rewritten ones, under
  * the manifest lock. Replaced files stay on disk for time travel. */
class DocStoreReplaceDataWrite(path: String, schema: StructType,
    order: Array[Int],
    queryId: String, op: DocStoreRowLevelOperation) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new DocStoreWriterFactory(path, schema, order, queryId)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    DocStoreCommitOps.withCommitLock(path) {
      val replaced = op.scannedSegments.toSet
      val current = DocStoreCommitOps.existingManifest(path)
      // write-conflict detection: the rewrite was computed FROM the
      // scanned segments, so every one must still be live at commit.
      // If a concurrent writer replaced or deleted one, committing
      // anyway would resurrect its pre-image rows alongside the other
      // writer's version (half-undoing their commit, duplicating
      // rows). Fail loudly — the serializable-conflict behavior Delta
      // gives as ConcurrentModificationException.
      val gone = replaced -- current.map(_.name).toSet
      if (gone.nonEmpty) {
        DocStoreCommitOps.dropStaged(path, messages)
        throw new IllegalStateException(
          s"concurrent write conflict on $path: segment(s) " +
            s"${gone.mkString(", ")} were rewritten or deleted after this " +
            "row-level operation scanned them; retry the operation")
      }
      val keep = current.filterNot(s => replaced(s.name))
      val next = DocStoreCommitOps.nextPartNumber(path)
      DocStoreCommitOps.publish(path, messages, keep, queryId,
        i => f"part-${next + i}%05d.gds")
    }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    DocStoreCommitOps.dropStaged(path, messages)
}
