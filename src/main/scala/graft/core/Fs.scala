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
    * directories). ONE static shutdown hook drains a concurrent set of
    * registered paths — per-call hooks would grow the JVM's hook table
    * without bound in a long-lived session invoking gates repeatedly. */
  private val exitPaths = java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()
  private lazy val exitHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      exitPaths.forEach(p =>
        try deleteRecursively(p) catch { case _: Exception => () })))

  def deleteOnExit(dir: Path): Unit = {
    exitHook
    exitPaths.add(dir)
  }

  private val rotating =
    new java.util.concurrent.ConcurrentHashMap[String, Path]()

  /** Per-invocation scratch root that ROTATES under `key`: returns a
    * fresh temp dir, best-effort reclaims the key's previous one (its
    * lazy consumers are invalidated by the new invocation — the
    * contract every per-invocation gate fixture shares), and registers
    * the new dir for JVM-exit cleanup. Rotation matters for bench
    * sweeps: each gate runs ~3× (warm-up + timed), and deferring every
    * copy to JVM exit would hold ~3× gates of full fixtures in /tmp at
    * once — rotation bounds it at one previous + one current per key,
    * while per-invocation unique paths keep the concurrent-JVM hazard
    * closed. One implementation instead of a copy per gate (r16
    * review finding). */
  def rotatingTempRoot(key: String): Path = {
    val fresh = java.nio.file.Files.createTempDirectory(key)
    deleteOnExit(fresh)
    Option(rotating.put(key, fresh)).foreach(prev =>
      try deleteRecursively(prev) catch { case _: Exception => () })
    fresh
  }
}
