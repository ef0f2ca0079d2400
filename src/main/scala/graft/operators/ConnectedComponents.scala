package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.slf4j.LoggerFactory

/** Connected components via min-label propagation — the Pregel superstep
  * pattern (per-iteration join + min-agg, convergence checked on an
  * aggregated scalar, lineage truncated each step). This is the step that
  * actually deduplicates a corpus: every doc gets the min doc_id of its
  * near-dup component as its canonical representative.
  *
  * Fault tolerance at cluster scale (round-2 verdict item 5):
  * `localCheckpoint()` stores blocks on executors only — one lost
  * executor kills the whole propagation chain. When the session has a
  * reliable checkpoint dir configured (`sc.setCheckpointDir`, an
  * HDFS/object-store path on a real cluster), supersteps use reliable
  * `checkpoint()` instead; local mode keeps the cheap executor-local
  * variant. Callers can also pass `checkpointDir` to set it explicitly.
  *
  * Non-convergence at the superstep cap is NOT silent: the result carries
  * a `converged` flag and a warning is logged — labels may be wrong for
  * any component whose diameter exceeds `maxIter`.
  */
object ConnectedComponents {

  private val log = LoggerFactory.getLogger(getClass)

  /** `labels`: (doc_id, label) with label = component min id (if
    * converged). `iterations` = supersteps actually run. */
  final case class Result(labels: DataFrame, converged: Boolean, iterations: Int)

  /** @param vertices one column `doc_id`
    * @param edges    two columns `a`, `b` — DIRECTED; pass both
    *                 orientations for undirected graphs
    * @param maxIter  superstep cap; propagation needs >= the largest
    *                 component diameter to converge */
  def minLabelPropagation(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 20,
                          checkpointDir: Option[String] = None): Result = {
    val sc = vertices.sparkSession.sparkContext
    // Scoping: when the context had NO checkpoint dir, an explicit
    // checkpointDir is cleared again after the run. When one was already
    // set it is left in place: getCheckpointDir returns the UUID-suffixed
    // internal path, and re-setting it would nest a fresh UUID under it
    // on every call — there is no true restore API.
    val prevDir = sc.getCheckpointDir
    checkpointDir.foreach(sc.setCheckpointDir)
    try {
      val reliable = sc.getCheckpointDir.isDefined
      def truncate(df: DataFrame): DataFrame =
        if (reliable) df.checkpoint() else df.localCheckpoint()

      val bi = truncate(edges)
      var labels = truncate(vertices.select(col("doc_id"), col("doc_id").as("label")))
      var converged = false
      var iter = 0
      while (!converged && iter < maxIter) {
        val viaNbr = bi.join(labels, bi("a") === labels("doc_id"))
          .select(col("b").as("doc_id"), col("label"))
        val next = labels.select(col("doc_id"), col("label")).union(viaNbr)
          .groupBy("doc_id").agg(min(col("label")).as("label"))
        val nextT = truncate(next) // truncate lineage per superstep
        val changed = nextT.as("n").join(labels.as("o"), "doc_id")
          .filter(col("n.label") =!= col("o.label")).count()
        labels = nextT
        converged = changed == 0
        iter += 1
      }
      if (!converged)
        log.warn(s"min-label propagation did NOT converge after $maxIter " +
          "supersteps - labels may be wrong for components with diameter " +
          s"> $maxIter; raise maxIter or pre-contract the graph")
      Result(labels, converged, iter)
    } finally {
      if (checkpointDir.isDefined && prevDir.isEmpty) sc.setCheckpointDir(null)
    }
  }
}
