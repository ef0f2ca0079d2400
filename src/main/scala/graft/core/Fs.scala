package graft.core

import java.nio.file.{Files, Path}

/** Local-filesystem scratch helpers for the gates that must materialize
  * intermediate state (streaming sources/sinks, snapshot versions).
  * ONE implementation of recursive delete — the walk-reverse-delete
  * snippet was previously duplicated at two sites, sharing the same
  * latent flaw (an unclosed Files.walk stream holding directory
  * handles until GC). */
object Fs {

  /** Recursively delete `dir` if it exists. The walk stream is fully
    * materialized before any delete (walk is lazy — deleting under a
    * live traversal is undefined) and closed deterministically. */
  def deleteRecursively(dir: Path): Unit =
    if (Files.exists(dir)) {
      val stream = Files.walk(dir)
      val paths =
        try {
          import scala.jdk.CollectionConverters._
          stream.iterator().asScala.toVector
        } finally stream.close()
      paths.reverse.foreach(Files.deleteIfExists(_))
    }

  def deleteRecursively(dir: String): Unit =
    deleteRecursively(java.nio.file.Paths.get(dir))
}
