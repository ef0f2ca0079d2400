package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.ConnectedComponents

/** The dedup clustering operator in isolation: fixpoint labels, the
  * non-convergence flag at the superstep cap, and the reliable-checkpoint
  * path (round-2 verdict item 5). */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  // path graph 1-2-3-4-5 (diameter 4) + isolated 10 + pair 20-21
  private def vertices = Seq(1L, 2L, 3L, 4L, 5L, 10L, 20L, 21L).toDF("doc_id")
  private def edges = {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (20L, 21L)).toDF("a", "b")
    e.union(e.select(col("b"), col("a")))
  }

  test("converges to component minima") {
    val r = ConnectedComponents.minLabelPropagation(vertices, edges)
    assert(r.converged)
    val got = r.labels.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("superstep cap below the diameter -> converged=false, not silent") {
    // diameter 4 needs 4 supersteps + 1 to observe the fixpoint; cap at 2
    val r = ConnectedComponents.minLabelPropagation(vertices, edges, maxIter = 2)
    assert(!r.converged && r.iterations === 2)
    // the far end of the path has not received the min label yet
    val lbl5 = r.labels.filter(col("doc_id") === 5L).head().getLong(1)
    assert(lbl5 !== 1L)
  }

  test("reliable checkpoint dir: same labels, checkpoint files written") {
    val dir = Files.createTempDirectory("cc_ckpt").toString
    val r = ConnectedComponents.minLabelPropagation(vertices, edges,
      checkpointDir = Some(dir))
    assert(r.converged)
    val got = r.labels.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got(5L) === 1L && got(21L) === 20L)
    // reliable checkpoints materialize under the configured dir
    assert(Files.list(java.nio.file.Paths.get(dir)).count() > 0)
  }
}
