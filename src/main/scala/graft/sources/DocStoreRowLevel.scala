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
    new DocStoreRowLevelScanBuilder(path, Some(this))

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
  * dropped (see the class doc of [[DocStoreRowLevelOperation]]).
  * Shared by BOTH row-level modes: copy-on-write passes its operation
  * so the scan can record the replaced-group set; merge-on-read
  * passes None (deltas reference rows by id — nothing is replaced
  * wholesale, so there is no group set to record). */
class DocStoreRowLevelScanBuilder(path: String,
    op: Option[DocStoreRowLevelOperation])
    extends ScanBuilder with SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {

  private var lo = Long.MinValue
  private var hi = Long.MaxValue
  private var allFilters = Array.empty[Filter]
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
    allFilters = filters
    filters.foreach { f =>
      DocStore.tightenDocIdBound(f, lo, hi).foreach { case (l, h) =>
        lo = l; hi = h
      }
    }
    filters // ALL residual: the rewrite plan re-evaluates the condition
  }
  override def pushedFilters(): Array[Filter] = Array.empty

  override def build(): Scan = {
    val (segments, dvs) = DocStore.readManifestAndDeletes(path)
    // partition pruning narrows the GROUP (= segment) set exactly like
    // the read path: an UPDATE whose condition pins a partition column
    // rewrites only that partition's directories — at 100 TB the
    // difference between rewriting one partition and the whole table.
    // Sound because pruning only drops segments whose partition value
    // PROVABLY fails a conjunct: no matched row can live there.
    val partKeep = DocStorePartitioning.pruner(
      DocStorePartitioning.read(path), schema, allFilters)
    // stats + Bloom group pruning — the same envelopes the READ path
    // consults (`S,`/`L,`/`B,` manifest lines), applied to writes: a
    // segment a conjunct PROVABLY rules out can hold no matched row,
    // so it needn't be scanned OR rewritten. An `UPDATE … WHERE fp =
    // '…'` on a Bloom-indexed fingerprint rewrites ~1 segment instead
    // of the table — Delta's file-pruning-for-DML cost model.
    val statKeep = DocStore.statsPruner(schema, allFilters)
    new DocStoreRowLevelScan(path, schema, required,
      segments.filter(partKeep).filter(statKeep)
        .filter(s => s.maxId >= lo && s.minId <= hi),
      segments.size, op, dvs)
  }
}

class DocStoreRowLevelScan(path: String, schema: StructType,
    required: StructType,
    surviving: Seq[DocStore.Segment], total: Int,
    op: Option[DocStoreRowLevelOperation],
    dvs: Map[String, Array[Long]] = Map.empty)
    extends Scan with Batch with SupportsRuntimeV2Filtering {

  @volatile private var runtimeSurviving: Seq[DocStore.Segment] = surviving

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Runtime group filtering keys on doc_id — but it can only be
    * advertised when doc_id is IN this scan's projection: Spark
    * resolves the filter attributes against the scan OUTPUT, and a
    * command whose condition + assignments never touch doc_id (e.g.
    * `UPDATE t SET n_chars = … WHERE lang = …`) prunes it away, so an
    * unconditional advert fails analysis with "Unable to resolve
    * doc_id". Declining is sound: the rewrite set falls back to the
    * compile-time pruning, it just narrows less. */
  override def filterAttributes(): Array[NamedReference] =
    if (required.fieldNames.contains("doc_id"))
      Array(Expressions.column("doc_id"))
    else Array.empty

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
          // per-id conjunction of zone map AND doc_id Bloom (when the
          // table carries one — section 0): on an id-STRIPED table
          // every [minId, maxId] spans the whole range and narrows
          // nothing, but each matched id hashes into exactly its own
          // segment's filter, so the rewrite set shrinks to the
          // segments that really hold matches. No false negatives =
          // no segment holding a match is ever dropped.
          runtimeSurviving = runtimeSurviving.filter(s =>
            ids.exists(id => id >= s.minId && id <= s.maxId &&
              s.blooms.get(0).forall(
                _.mightContain(DocStore.bloomHashLong(id)))))
      }
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    op.foreach(_.scannedSegments = runtimeSurviving.map(_.name))
    runtimeSurviving.map(s => DocStorePartition(
      Paths.get(path, s.name).toString,
      dvs.getOrElse(s.name, Array.empty), s.name,
      s.schemaGen): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // old-generation nested payloads decode per their write-time types
    // here too — the rewrite re-encodes them under the LIVE schema, so
    // every CoW/MERGE touch heals a segment forward to generation-now
    new DocStoreReaderFactory(schema, required,
      Long.MinValue, Long.MaxValue, Int.MaxValue,
      genWriteTypes = DocStoreScan.genWriteTypes(path, schema,
        surviving.map(_.schemaGen)))

  override def description(): String =
    s"GraftDocStore row-level segments=${surviving.size}/$total (full rows)"
}

/** Merge-on-read row-level operations — the `SupportsDelta` face, the
  * Iceberg-v2-position-delete / Delta-deletion-vector cost model:
  * instead of rewriting every segment that HOLDS a matched row
  * (copy-on-write), only the matched rows themselves move. DELETEs
  * become deletion-vector entries (`D,<segment>,<pos>` manifest
  * lines — a 10-row DELETE against a 10 GB segment writes 10 lines of
  * metadata); UPDATEs split into a DV entry plus a reinsert into a
  * fresh segment (`representUpdateAsDeleteAndInsert`); MERGE inserts
  * append normally. The scan side is unchanged (group pruning narrows
  * to segments holding matches; Spark's rewrite plan selects the
  * matched rows and hands each to [[DocStoreDeltaWriter]] with its
  * (_segment, _pos) row id). Reads pay an O(log |dv|) skip per row of
  * affected segments until a compaction or copy-on-write pass purges
  * the vectors — exactly the read-amplification trade Delta/Iceberg
  * users choose per table via `graft.rowlevel.mode=merge-on-read`. */
class DocStoreDeltaOperation(path: String, cmd: Command)
    extends org.apache.spark.sql.connector.write.SupportsDelta {

  override def command(): Command = cmd

  /** (_segment, _pos) locate the row; doc_id rides along so update()
    * can tell a PRESERVED id from a reassignment — an UPDATE that SETs
    * doc_id on a GENERATED ALWAYS table must refuse (Delta refuses
    * identity-column updates), and without the original id the two
    * cases are indistinguishable (r13 review finding). */
  override def rowId(): Array[NamedReference] = Array(
    Expressions.column(SegmentMetadataColumn.NAME),
    Expressions.column(PosMetadataColumn.NAME),
    Expressions.column(RowDocIdMetadataColumn.NAME))

  /** Updates arrive as update(meta, id, row) — semantically the same
    * delete + reinsert (the writer decomposes them exactly so), but
    * keeping the operation distinct lets the writer tell an UPDATE's
    * reinsert (doc_id PRESERVED — the GENERATED ALWAYS refusal must
    * not fire on a row keeping its own id) from a genuine MERGE
    * INSERT (explicit ids refused, omitted ids assigned). ADVICE r12:
    * with `= true` both arrive through insert() and the two cases are
    * indistinguishable. */
  override def representUpdateAsDeleteAndInsert(): Boolean = false

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocStoreRowLevelScanBuilder(path, None)

  override def newWriteBuilder(info: LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.DeltaWriteBuilder = {
    val schema = DocStore.tableSchema(path)
    val in = info.schema()
    val expect = schema.fields.map(f => f.name -> f.dataType).toMap
    // a pure DELETE carries NO data rows — only rowIds — so its write
    // schema is legitimately empty; anything else must match exactly
    require(in.fields.isEmpty || (in.fields.length == expect.size &&
      in.fields.forall(f => expect.get(f.name).contains(f.dataType))),
      s"delta write schema must be ${schema.simpleString} (or empty " +
        s"for delete-only), got ${in.simpleString}")
    val order =
      if (in.fields.isEmpty) Array.empty[Int]
      else schema.fields.map(f => in.fieldIndex(f.name))
    // rowId rows project (_segment, _pos) in rowId() declaration order
    new org.apache.spark.sql.connector.write.DeltaWriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.DeltaWrite =
        new org.apache.spark.sql.connector.write.DeltaWrite {
          override def toBatch: org.apache.spark.sql.connector.write.DeltaBatchWrite =
            new DocStoreDeltaBatchWrite(path, schema, order, info.queryId())
        }
    }
  }

  override def description(): String = s"GraftDocStore $cmd (merge-on-read)"
}

final case class DocStoreDeltaCommit(tmpName: String, rows: Long,
    minId: Long, maxId: Long, bytes: Long,
    deletes: Seq[(String, Long)],
    stats: Map[Int, DocStore.ColStat] = Map.empty,
    leafStats: Map[Int, Map[String, DocStore.ColStat]] = Map.empty,
    schemaGen: Long = 0L,
    blooms: Map[Int, DocStore.Bloom] = Map.empty,
    leafBlooms: Map[Int, Map[String, DocStore.Bloom]] = Map.empty)
    extends WriterCommitMessage

class DocStoreDeltaBatchWrite(path: String, schema: StructType,
    order: Array[Int], queryId: String)
    extends org.apache.spark.sql.connector.write.DeltaBatchWrite {

  // ADVICE r12: identity rides the row-level write path too — a MERGE
  // WHEN NOT MATCHED INSERT on a GENERATED ALWAYS table must refuse
  // explicit doc_ids and assign omitted ones, exactly like a batch
  // append (Delta's identity-through-MERGE semantics). A delete-only
  // delta (empty order) never inserts, so it skips the spec.
  private val identity =
    if (order.isEmpty) None else DocStore.identityOf(schema)
  @volatile private var identityBase: Long = Long.MinValue

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DeltaWriterFactory = {
    val idAssign = identity.map { spec =>
      identityBase = DocStore.readIdentityHw(path, spec)
      (spec, identityBase, info.numPartitions)
    }
    new DocStoreDeltaWriterFactory(path, schema, order, queryId, idAssign)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    DocStoreCommitOps.withCommitLock(path) {
      val commits = messages.collect { case m: DocStoreDeltaCommit => m }
      val (current, existing) = DocStore.readManifestAndDeletes(path)
      val live = current.map(_.name).toSet
      def fail(reason: String): Nothing = {
        commits.foreach(m =>
          Files.deleteIfExists(Paths.get(path).resolve(m.tmpName)))
        throw new IllegalStateException(
          s"concurrent write conflict on $path: $reason; retry the operation")
      }
      // identity conflict check (mirrors DocStoreBatchWrite.commit): if
      // the high water moved since this job's base was read, a
      // concurrent identity write landed and the assigned stripes may
      // overlap — fail loudly, retry re-plans on the new base
      identity.foreach { spec =>
        val now = DocStore.readIdentityHw(path, spec)
        if (now != identityBase) fail(s"concurrent identity write " +
          s"(high water moved $identityBase -> $now since this " +
          "operation planned)")
      }
      // conflict check 1: every DV target segment must still be live —
      // a concurrent rewrite of one means our positions reference a
      // file no longer in the table (committing would corrupt nothing
      // but silently DROP the delete), so fail loudly
      val targets = commits.flatMap(_.deletes.map(_._1)).toSet
      val gone = targets -- live
      if (gone.nonEmpty) fail(s"segment(s) ${gone.mkString(", ")} were " +
        "rewritten or deleted after this merge-on-read operation scanned them")
      // conflict check 2: none of our DV positions may ALREADY be
      // deleted — our scan skipped DV'd rows, so an overlap means a
      // concurrent op touched the same row after we scanned it.
      // Committing anyway would duplicate the row (both reinserts land)
      // or silently undo their DELETE with our reinsert.
      val ours = commits.flatMap(_.deletes)
      val overlap = ours.filter { case (s, p) =>
        existing.get(s).exists(a =>
          java.util.Arrays.binarySearch(a, p) >= 0)
      }
      if (overlap.nonEmpty) fail(
        s"row(s) ${overlap.take(5).mkString(", ")} were deleted or " +
          "updated by a concurrent operation after this one scanned them")
      val merged = {
        val all = existing.toSeq
          .flatMap { case (s, ps) => ps.map(s -> _) } ++ ours
        all.groupBy(_._1)
          .map { case (s, ps) => s -> ps.map(_._2).distinct.sorted.toArray }
      }
      // claim count: the MoR path stages DocStoreDeltaCommit messages,
      // which stagedOf (DocStoreCommit-shaped) does NOT collect
      val next = DocStoreCommitOps.claimPartNumbers(path,
        messages.count {
          case m: DocStoreDeltaCommit => m.rows > 0
          case _ => false
        })
      // publish() moves the insert segments in and the single manifest
      // rename lands inserts + deletion vectors together
      DocStoreCommitOps.publish(path,
        messages.collect { case m: DocStoreDeltaCommit =>
          DocStoreCommit(m.tmpName, m.rows, m.minId, m.maxId, m.bytes,
            stats = m.stats, leafStats = m.leafStats,
            schemaGen = m.schemaGen, blooms = m.blooms,
            leafBlooms = m.leafBlooms): WriterCommitMessage
        },
        current, queryId, i => f"part-${next + i}%05d.gds", merged)
    }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: DocStoreDeltaCommit => m }
      .foreach(m => Files.deleteIfExists(Paths.get(path).resolve(m.tmpName)))
}

class DocStoreDeltaWriterFactory(path: String, schema: StructType,
    order: Array[Int], queryId: String,
    identity: Option[(DocStore.IdentitySpec, Long, Int)] = None)
    extends org.apache.spark.sql.connector.write.DeltaWriterFactory {
  // ADVICE r12 (medium): the table's row contracts (NOT NULL, GENERATED
  // ALWAYS AS, CHECK constraints) are compiled on the DRIVER exactly as
  // DocStoreWriterFactory does and enforced on every MoR MERGE/UPDATE
  // insert — previously the delta path silently skipped them (Delta
  // enforces on all writes). A delete-only delta carries no data
  // columns (empty order), so there is nothing to compile or enforce.
  private val checks =
    if (order.isEmpty) Seq.empty
    else DocStoreChecks.compile(path, schema, order)
  private val maxRows = DocStoreWriterFactory.maxRowsOf(path)
  private val compress = DocStoreWriterFactory.compressionOf(path)
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] =
    new DocStoreDeltaWriter(path, schema, order, queryId, partitionId,
      taskId, checks, maxRows, identity, compress)
}

/** One task's delta: deletes accumulate as (segment, pos) pairs from
  * the rowId projection; inserts stream into a fresh segment through
  * the ordinary encoder. The task's commit message carries both, so
  * the job commit can land them in one manifest publish. */
class DocStoreDeltaWriter(path: String, schema: StructType,
    order: Array[Int], queryId: String, partitionId: Int, taskId: Long,
    checks: Seq[(String,
      org.apache.spark.sql.catalyst.expressions.Expression)] = Seq.empty,
    maxRows: Int = Int.MaxValue,
    identity: Option[(DocStore.IdentitySpec, Long, Int)] = None,
    compress: Boolean = false)
    extends org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] {

  private val inner =
    new DocStoreDataWriter(path, schema, order, queryId, partitionId, taskId,
      checks = checks, maxRowsPerSegment = maxRows, identity = identity,
      compress = compress)
  private val deletes = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]

  /** rowId layout follows [[DocStoreDeltaOperation.rowId]]:
    * (_segment string, _pos long). */
  private def recordDelete(id: InternalRow): Unit =
    deletes += ((id.getUTF8String(0).toString, id.getLong(1)))

  override def delete(meta: InternalRow, id: InternalRow): Unit =
    recordDelete(id)

  override def update(meta: InternalRow, id: InternalRow,
      row: InternalRow): Unit = {
    // an UPDATE decomposes into DV-delete + reinsert; the reinsert
    // PRESERVES the row's existing doc_id (see writePreservingIdentity).
    // On GENERATED ALWAYS, "preserve" means EXACTLY the original id —
    // id(2) carries it (see rowId) — so SET doc_id = <other> refuses.
    recordDelete(id)
    identity.foreach { case (spec, _, _) =>
      if (!spec.allowExplicit)
        require(!row.isNullAt(order(0)) &&
          row.getLong(order(0)) == id.getLong(2),
          "doc_id is GENERATED ALWAYS AS IDENTITY — an UPDATE may not " +
            "assign it (the row keeps its own id)")
    }
    inner.writePreservingIdentity(row)
  }

  override def insert(row: InternalRow): Unit = inner.write(row)

  override def commit(): WriterCommitMessage = {
    val c = inner.commit().asInstanceOf[DocStoreCommit]
    // stats, leaf stats, the nested-codec generation stamp AND the
    // Bloom sections all carry through — a MoR insert segment prunes
    // and decodes exactly like a batch-appended one
    DocStoreDeltaCommit(c.tmpName, c.rows, c.minId, c.maxId, c.bytes,
      deletes.toSeq, c.stats, c.leafStats, c.schemaGen, c.blooms,
      c.leafBlooms)
  }
  override def abort(): Unit = inner.abort()
  override def close(): Unit = inner.close()
}

/** Commit = swap the scanned segments for the rewritten ones, under
  * the manifest lock. Replaced files stay on disk for time travel. */
class DocStoreReplaceDataWrite(path: String, schema: StructType,
    order: Array[Int],
    queryId: String, op: DocStoreRowLevelOperation) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    // partitioned tables: rewritten rows recompute their partition
    // directories through the same partition-aware writer as inserts.
    // Identity is deliberately NOT threaded here: group-based
    // copy-on-write streams retained rows and merge-inserts through
    // ONE writer with no per-row provenance, so a GENERATED ALWAYS
    // refusal would reject every preserved id. The delta (MoR) path
    // enforces the full identity contract; CoW stays collision-safe
    // because publish() advances the watermark past every landed id.
    new DocStoreWriterFactory(path, schema, order, queryId,
      DocStorePartitioning.read(path))

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    DocStoreCommitOps.withCommitLock(path) {
      val replaced = op.scannedSegments.toSet
      val (current, dvs) = DocStore.readManifestAndDeletes(path)
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
      val next = DocStoreCommitOps.claimPartNumbers(path,
        DocStoreCommitOps.stagedOf(messages).count(_.rows > 0))
      // kept segments keep their deletion vectors; the replaced
      // segments' DVs die with them (the rewrite scan applied them)
      DocStoreCommitOps.publish(path, messages, keep, queryId,
        i => f"part-${next + i}%05d.gds", dvs)
    }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    DocStoreCommitOps.dropStaged(path, messages)
}
