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
  *    (the deletion-vector delta) are **deletes**; everything else is
  *    untouched and never scanned.
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
  * `_commit_version` (= `toV`). Snapshot semantics: rows inserted AND
  * deleted strictly inside the range net out, like Delta CDF reading
  * a compacted history.
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
    * Known limitation (vs Delta's dataChange=false): the manifest
    * carries no "pure rewrite" flag, so a history-PRESERVING
    * compaction commit — same rows, new segment names — would
    * classify as full delete+insert churn. Unreachable today: the
    * engine's only whole-table rewrite (truncating overwrite, the
    * q130 compaction) resets version history, so a feed crossing it
    * fails LOUDLY on the missing snapshot instead of emitting churn;
    * row-level CoW rewrites replace only matched segments, which ARE
    * data changes. The flag becomes necessary the day a
    * history-preserving OPTIMIZE ships. */
  def snapshotDiff(path: String, fromV: Long, toV: Long)
      : (Seq[DocStore.Segment], Seq[DocStore.Segment],
         Map[String, Array[Long]], Map[String, Array[Long]],
         Seq[(String, Array[Long])]) = {
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
    val dvDelta = (fromNames & toNames).toSeq.sorted.flatMap { n =>
      val before = fromDv.getOrElse(n, Array.empty[Long]).toSet
      val delta = toDv.getOrElse(n, Array.empty[Long]).filterNot(before).sorted
      if (delta.isEmpty) None else Some(n -> delta)
    }
    (added, removed, fromDv, toDv, dvDelta)
  }

  def changesBetween(s: SparkSession, path: String,
      fromV: Long, toV: Long): DataFrame = {
    val fromM = s"MANIFEST.v$fromV"
    val toM = s"MANIFEST.v$toV"
    val (addedSegs, removedSegs, _, _, dvDeltaSegs) =
      snapshotDiff(path, fromV, toV)
    val added = addedSegs.map(_.name)
    val removed = removedSegs.map(_.name)
    val dvDelta: Seq[(String, Long)] =
      dvDeltaSegs.flatMap { case (n, ps) => ps.map(n -> _) }

    val dataCols = DocStore.tableSchema(path).fieldNames.toSeq
    def face(manifest: String, names: Seq[String]): DataFrame =
      s.read.format("graft-docstore")
        .option("path", path).option("manifest", manifest)
        .option("segments", names.mkString(",")).load()
    def tagged(df: DataFrame, typ: String): DataFrame =
      df.select(dataCols.map(col): _*)
        .withColumn("_change_type", lit(typ))
        .withColumn("_commit_version", lit(toV))

    val inserts =
      if (added.isEmpty) None
      else Some(tagged(face(toM, added), "insert"))
    val removals =
      if (removed.isEmpty) None
      else Some(tagged(face(fromM, removed), "delete"))
    val dvRemovals =
      if (dvDelta.isEmpty) None
      else {
        import s.implicits._
        val delta = dvDelta.toDF("_seg_d", "_pos_d")
        val alive = face(fromM, dvDelta.map(_._1).distinct)
          .select((dataCols.map(col) :+ col("_segment") :+ col("_pos")): _*)
        Some(tagged(
          alive.join(broadcast(delta),
            alive("_segment") === delta("_seg_d") &&
              alive("_pos") === delta("_pos_d")),
          "delete"))
      }

    (inserts.toSeq ++ removals ++ dvRemovals)
      .reduceOption(_.unionByName(_))
      .getOrElse(tagged( // empty range: 0-row frame with the CDF schema
        // (live-manifest face: a v0 anchor has no MANIFEST.v0 file)
        s.read.format("graft-docstore")
          .option("path", path).load().limit(0),
        "insert"))
  }
}
