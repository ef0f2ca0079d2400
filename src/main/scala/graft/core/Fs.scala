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

  /** Recursively copy the CONTENTS of `src` under `dst` (created if
    * absent). Docstore manifests hold relative segment names, so a
    * directory copy is a faithful table clone — what lets gates that
    * CONSUME their input state (compaction, DELETE) re-hydrate a
    * Scratch-built pristine fixture in milliseconds per invocation
    * instead of rebuilding it inside the timed region. */
  def copyRecursively(src: Path, dst: Path): Unit = {
    val stream = Files.walk(src)
    val paths =
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala.toVector
      } finally stream.close()
    paths.foreach { p =>
      val to = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(to)
      else Files.copy(p, to,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Delete `dir` when the JVM exits — for scratch a gate's RESULT
    * DataFrame still lazily reads (deleting eagerly would break a later
    * action on the returned plan; File.deleteOnExit can't do recursive
    * directories). Hooks accumulate per registration, so callers should
    * register once per invocation-scoped temp dir, not in loops. */
  def deleteOnExit(dir: Path): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try deleteRecursively(dir) catch { case _: Exception => () }))
}
