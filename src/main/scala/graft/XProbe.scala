package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Throwaway optimization probe (r21): run one lifecycle gate, then count
  * the files each index layer dir holds — the frag_write/cells_write cost
  * hypothesis is per-file overhead, so the file census is the evidence. */
object XProbe {
  def census(root: Path): Unit = {
    def walk(p: Path): Seq[Path] = {
      val s = Files.walk(p)
      try s.iterator().asScala.filter(Files.isRegularFile(_)).toVector
      finally s.close()
    }
    walk(root).groupBy(f => root.relativize(f).toString.split("/").take(6).mkString("/"))
      .toSeq.sortBy(_._1).foreach { case (d, fs) =>
        val bytes = fs.map(Files.size(_)).sum
        println(f"CENSUS $d%-60s files=${fs.size}%4d bytes=$bytes%9d")
      }
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = args.headOption.getOrElse("q223_ann_procedures")
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    println(f"GATE $name took ${(System.nanoTime() - t0) / 1e9}%.2f s (cold)")
    // census every live gate temp root (deleteOnExit keeps them until exit)
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val l = Files.list(tmp)
    val roots = try l.iterator().asScala
      .filter(p => p.getFileName.toString.startsWith(name.take(4)))
      .toVector finally l.close()
    roots.foreach { r => println(s"ROOT $r"); census(r) }
    spark.stop()
  }
}
