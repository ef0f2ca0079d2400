package graft

import graft.core.Scratch
import graft.queries.Registry

/** Contract tests for the build-once scratch cache (round-6 verdict
  * items 2/3): first call builds, later calls are pure lookups, distinct
  * keys never share state, and the q101 gate really consumes the stored
  * cluster-map artifact rather than re-deriving the clustering. */
class ScratchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("materialize builds exactly once per key and caches across calls") {
    val key = s"spec|${System.nanoTime()}" // fresh key per test run
    var builds = 0
    def get(): String = Scratch.materialize("scratch_spec", key) { p =>
      builds += 1
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(p, "artifact.txt"), "payload")
    }
    val first = get()
    val second = get()
    assert(builds == 1, s"expected one build, got $builds")
    assert(first == second)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(first, "artifact.txt")) == "payload")
    // a different key is a different artifact — no cross-key sharing
    val other = Scratch.materialize("scratch_spec", key + "|v2") { p =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(p, "artifact.txt"), "other")
    }
    assert(other != first)
    // invalidate drops the artifact; the next call rebuilds
    Scratch.invalidate("scratch_spec", key)
    get()
    assert(builds == 2, "invalidate must force a rebuild")
    Scratch.invalidate("scratch_spec", key)
    Scratch.invalidate("scratch_spec", key + "|v2")
  }

  test("stored cluster map == live clustering, and q101 consumes the stored artifact") {
    val path = graft.queries.LlmOps.clusterMapPath(spark, dir)
    val stored = spark.read.parquet(path).select("doc_id", "canonical_id")
    val live = Registry.byName("q26b_dedup_clusters").fn(spark, dir)
      .select("doc_id", "canonical_id")
    // same assignment for every doc, both directions
    assert(stored.exceptAll(live).isEmpty && live.exceptAll(stored).isEmpty,
      "stored cluster map diverged from the live label propagation")
    // the split gate's scan set is exactly the stored artifact — the
    // proof that q101 reads the published map, not a fresh re-derivation
    val q101 = Registry.byName("q101_leakage_split").fn(spark, dir)
    val inputs = q101.inputFiles
    assert(inputs.nonEmpty)
    def localPath(f: String): String =
      if (f.startsWith("file:")) java.nio.file.Paths.get(new java.net.URI(f)).toString
      else f
    assert(inputs.forall(f => localPath(f).startsWith(path)),
      s"q101 must read only the stored cluster map, read: ${inputs.take(3).mkString(", ")}")
  }
  test("annStateServe never probes an emptied cell (c = 0 zero centroid)") {
    // a maintenance batch that deletes EVERY vector of a cell leaves
    // (sv = 0-vector, c = 0) in the subtracted state; its probe
    // distance is exactly 0, so without the c > 0 guard the dead cell
    // would win a probe slot for every query while contributing zero
    // candidates (r17 review scenario — the shipped fixtures delete
    // 1-in-7 per cell and never empty one, hence this synthetic pin)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dim = 4
    // cell 0: EMPTIED (zero centroid, c = 0); cells 1, 2: live
    val cents = Seq(
      (0, Seq.fill(dim)(0L), 0L),
      (1, Seq(1000L, 0L, 0L, 0L), 1L),
      (2, Seq(0L, 1000L, 0L, 0L), 1L)).toDF("label", "sv", "c")
    val pool = Seq(
      (11L, Seq(1000L, 0L, 0L, 0L), 1000000L, 1),
      (22L, Seq(0L, 1000L, 0L, 0L), 1000000L, 2)
    ).toDF("vec_id", "q", "nn", "label")
    val qs = Seq((99L, Seq(700L, 700L, 0L, 0L), 980000L))
      .toDF("qid", "qv", "qn")
    val out = graft.queries.EmbedOps.annStateServe(qs, cents, pool)
      .collect()
    // both live cells probed (nprobe = 2), both candidates returned —
    // the dead cell stole neither slot
    assert(out.map(_.getLong(2)).toSet == Set(11L, 22L),
      out.mkString(";"))
  }
}
