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

  def changesBetween(s: SparkSession, path: String,
      fromV: Long, toV: Long): DataFrame = {
    require(fromV <= toV, s"changesBetween: fromV $fromV > toV $toV")
    val fromM = s"MANIFEST.v$fromV"
    val toM = s"MANIFEST.v$toV"
    // version 0 is the table before its first publish: empty by
    // definition (no MANIFEST.v0 file exists), so a v0-anchored feed
    // reports the first commit's full content as inserts
    val (fromSegs, fromDv) =
      if (fromV == 0L) (Seq.empty[DocStore.Segment], Map.empty[String, Array[Long]])
      else DocStore.readManifestAndDeletes(path, fromM)
    val (toSegs, toDv) =
      if (toV == 0L) (Seq.empty[DocStore.Segment], Map.empty[String, Array[Long]])
      else DocStore.readManifestAndDeletes(path, toM)
    val fromNames = fromSegs.map(_.name).toSet
    val toNames = toSegs.map(_.name).toSet
    val added = (toNames -- fromNames).toSeq.sorted
    val removed = (fromNames -- toNames).toSeq.sorted
    // per common segment: positions dead in `to` but alive in `from`
    val dvDelta: Seq[(String, Long)] =
      (fromNames & toNames).toSeq.sorted.flatMap { n =>
        val before = fromDv.getOrElse(n, Array.empty[Long]).toSet
        toDv.getOrElse(n, Array.empty[Long]).toSeq
          .filterNot(before).sorted.map(n -> _)
      }

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
