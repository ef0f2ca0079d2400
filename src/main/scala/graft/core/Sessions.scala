package graft.core

import org.apache.spark.sql.SparkSession
import scala.util.Try

/** Conf-scoped session clones. `newSession()` shares the SparkContext
  * but resets runtime `conf.set` values to builder/SparkConf defaults —
  * a clone used to scope one legacy flag would silently drop the
  * caller's runtime settings (timezone, ANSI, shuffle partitions) for
  * every plan built on it. `scoped` copies the caller's runtime SQL conf
  * onto the clone first, then applies the scoped overrides, so the clone
  * differs from the caller in EXACTLY the overridden keys. */
object Sessions {
  def scoped(spark: SparkSession, overrides: (String, String)*): SparkSession = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      Try(s.conf.set(k, v)) // static/non-settable entries are skipped
    }
    overrides.foreach { case (k, v) => s.conf.set(k, v) }
    s
  }
}
