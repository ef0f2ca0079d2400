package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Change data feed over the docstore's retained manifest versions —
  * the Delta `table_changes(t, from, to)` surface, computed as a
  * snapshot diff that never touches an unchanged file.
  *
  * Every publish retains `MANIFEST.v<n>`, segments are immutable once
  * published, and merge-on-read deletion vectors only GROW per segment
  * until a rewrite replaces it — so the complete change set between two
  * versions is derivable from two metadata reads:
  *
  *  - segments in `to` but not `from` → every row they hold (minus
  *    their own `to`-version deletion vectors) is an **insert**;
  *  - segments in `from` but not `to` → every row alive at `from` is a
  *    **delete** (a copy-on-write UPDATE therefore reads as
  *    delete+insert pairs — exactly Delta CDF's behavior without row
  *    tracking);
  *  - segments in both → positions dead in `to` but alive in `from`
  *    (the deletion-vector delta) are **deletes**, and positions alive
  *    in `to` but dead in `from` (possible only through
  *    `system.restore` republishing a pre-delete vector) are
  *    **inserts** — reinstated rows; everything else is untouched and
  *    never scanned.
  *
  * The scans read ONLY the changed files, via the format's `manifest`
  * (version face) + `segments` (explicit name subset) read options —
  * at 100 TB a small commit's change feed costs two metadata reads
  * plus the touched segments, not a table scan. The deletion-vector
  * delta rides a broadcast join keyed on the physical row id
  * (`_segment`, `_pos`): its size is the number of rows the MoR
  * commits deleted in the range — the same payload the manifests
  * themselves carry, metadata-class by the MoR write discipline.
  *
  * Output schema: table columns + `_change_type` ('insert'|'delete') +
  * `_commit_version` — the commit at which the change ACTUALLY
  * happened. A multi-commit range is the UNION of its per-commit
  * diffs (Delta's `table_changes` semantics exactly): every
  * intermediate change is emitted with exact attribution — a row
  * inserted and deleted inside the range appears as an insert AND a
  * delete, it does not net out — and a `dataChange=false` rewrite
  * commit (history-preserving OPTIMIZE) contributes NOTHING, same as
  * Delta CDF crossing a compaction. The per-commit walk is driver-side
  * metadata; each commit's scan touches only that commit's segments.
  */
object DocStoreCdf {

  /** The snapshot-diff classification BOTH change-feed faces consume —
    * batch [[changesBetween]] and the streaming CDC planner
    * ([[DocStoreCdcMicroBatchStream.planInputPartitions]]) — so the
    * q149 stream == batch invariant holds structurally, not by two
    * parallel implementations staying in sync. Version 0 is the table
    * before its first publish: empty by definition. A missing retained
    * manifest fails LOUDLY (vacuum/truncate reset history past it).
    *
    * snapshotDiff is the raw layout diff: it reports a
    * `dataChange=false` rewrite commit's segment churn as-is. The
    * change-feed consumers above it — [[commitChanges]] and the
    * streaming planner — check [[DocStoreCommitOps.isRewriteCommit]]
    * FIRST and skip flagged commits entirely, so a history-preserving
    * `CALL system.optimize` emits zero phantom changes (Delta's
    * `table_changes` behavior across OPTIMIZE). */
  def snapshotDiff(path: String, fromV: Long, toV: Long)
      : (Seq[DocStore.Segment], Seq[DocStore.Segment],
         Map[String, Array[Long]], Map[String, Array[Long]],
         Seq[(DocStore.Segment, Array[Long])],
         Seq[(DocStore.Segment, Array[Long])]) = {
    require(fromV <= toV, s"snapshotDiff: fromV $fromV > toV $toV")
    def read(at: Long) =
      if (at == 0L) (Seq.empty[DocStore.Segment], Map.empty[String, Array[Long]])
      else {
        require(java.nio.file.Files.exists(
          java.nio.file.Paths.get(path).resolve(s"MANIFEST.v$at")),
          s"change feed needs MANIFEST.v$at of $path — vacuum or " +
            "truncate reset the history past it")
        DocStore.readManifestAndDeletes(path, s"MANIFEST.v$at")
      }
    val (fromSegs, fromDv) = read(fromV)
    val (toSegs, toDv) = read(toV)
    val fromNames = fromSegs.map(_.name).toSet
    val toNames = toSegs.map(_.name).toSet
    val added = toSegs.filterNot(s => fromNames(s.name)).sortBy(_.name)
    val removed = fromSegs.filterNot(s => toNames(s.name)).sortBy(_.name)
    // per common segment: positions dead in `to` but alive in `from`
    // (carried as the full Segment so the CDC planner can ship its
    // nested-codec generation with the partition)
    val toByName = toSegs.map(s => s.name -> s).toMap
    val dvDelta = (fromNames & toNames).toSeq.sorted.flatMap { n =>
      val before = fromDv.getOrElse(n, Array.empty[Long]).toSet
      val delta = toDv.getOrElse(n, Array.empty[Long]).filterNot(before).sorted
      if (delta.isEmpty) None else Some(toByName(n) -> delta)
    }
    // positions alive in `to` but dead in `from` — UN-deletes. The
    // "DVs only grow" write discipline means DML never produces these,
    // but system.restore across a MoR DELETE republishes the smaller
    // pre-delete vector, REINSTATING rows: without this component the
    // change feed emitted nothing for them and every CDC consumer
    // (streams, incremental dedup, the ANN index) silently served a
    // stale world (r19: found by the restore-replay spec, which is
    // exactly the audit Delta's RESTORE-emits-CDF contract implies)
    val dvUndelta = (fromNames & toNames).toSeq.sorted.flatMap { n =>
      val after = toDv.getOrElse(n, Array.empty[Long]).toSet
      val und = fromDv.getOrElse(n, Array.empty[Long]).filterNot(after).sorted
      if (und.isEmpty) None else Some(toByName(n) -> und)
    }
    (added, removed, fromDv, toDv, dvDelta, dvUndelta)
  }

  /** One commit's change faces, from the SHARED [[snapshotDiff]]
    * classification — the same unit the streaming CDC planner ships as
    * partitions, so stream == batch structurally. A `dataChange=false`
    * rewrite commit (history-preserving OPTIMIZE: same rows, new
    * segment layout) contributes nothing, exactly like Delta CDF
    * crossing an OPTIMIZE commit. */
  private def commitChanges(s: SparkSession, path: String,
      v: Long): Seq[DataFrame] = {
    if (DocStoreCommitOps.isRewriteCommit(path, v)) return Seq.empty
    val (addedSegs, removedSegs, _, _, dvDeltaSegs, dvUndeltaSegs) =
      snapshotDiff(path, v - 1, v)
    val added = addedSegs.map(_.name)
    val removed = removedSegs.map(_.name)
    val dvDelta: Seq[(String, Long)] =
      dvDeltaSegs.flatMap { case (seg, ps) => ps.map(seg.name -> _) }
    val dvUndelta: Seq[(String, Long)] =
      dvUndeltaSegs.flatMap { case (seg, ps) => ps.map(seg.name -> _) }

    val dataCols = DocStore.tableSchema(path).fieldNames.toSeq
    def face(manifest: String, names: Seq[String]): DataFrame =
      s.read.format("graft-docstore")
        .option("path", path).option("manifest", manifest)
        .option("segments", names.mkString(",")).load()
    def tagged(df: DataFrame, typ: String): DataFrame =
      df.select(dataCols.map(col): _*)
        .withColumn("_change_type", lit(typ))
        .withColumn("_commit_version", lit(v))

    val inserts =
      if (added.isEmpty) None
      else Some(tagged(face(s"MANIFEST.v$v", added), "insert"))
    val removals =
      if (removed.isEmpty) None
      else Some(tagged(face(s"MANIFEST.v${v - 1}", removed), "delete"))
    val dvRemovals =
      if (dvDelta.isEmpty) None
      else {
        import s.implicits._
        val delta = dvDelta.toDF("_seg_d", "_pos_d")
        val alive = face(s"MANIFEST.v${v - 1}", dvDelta.map(_._1).distinct)
          .select((dataCols.map(col) :+ col("_segment") :+ col("_pos")): _*)
        Some(tagged(
          alive.join(broadcast(delta),
            alive("_segment") === delta("_seg_d") &&
              alive("_pos") === delta("_pos_d")),
          "delete"))
      }
    // the un-delete face (restore across a MoR DELETE): rows alive in
    // `to` but dead in `from` re-enter the feed as inserts, read from
    // the TO manifest where they are visible again
    val dvReinstates =
      if (dvUndelta.isEmpty) None
      else {
        import s.implicits._
        val und = dvUndelta.toDF("_seg_u", "_pos_u")
        val aliveNow = face(s"MANIFEST.v$v", dvUndelta.map(_._1).distinct)
          .select((dataCols.map(col) :+ col("_segment") :+ col("_pos")): _*)
        Some(tagged(
          aliveNow.join(broadcast(und),
            aliveNow("_segment") === und("_seg_u") &&
              aliveNow("_pos") === und("_pos_u")),
          "insert"))
      }
    (inserts.toSeq ++ removals ++ dvRemovals ++ dvReinstates)
  }

  def changesBetween(s: SparkSession, path: String,
      fromV: Long, toV: Long): DataFrame = {
    require(fromV <= toV, s"changesBetween: fromV $fromV > toV $toV")
    (fromV + 1 to toV).flatMap(commitChanges(s, path, _))
      .reduceOption(_.unionByName(_))
      .getOrElse { // empty range: 0-row frame with the CDF schema
        // (live-manifest face: a v0 anchor has no MANIFEST.v0 file)
        val dataCols = DocStore.tableSchema(path).fieldNames.toSeq
        s.read.format("graft-docstore")
          .option("path", path).load().limit(0)
          .select(dataCols.map(col): _*)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(toV))
      }
  }
}
