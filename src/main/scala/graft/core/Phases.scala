package graft.core

import scala.jdk.CollectionConverters._

/** Per-gate phase attribution (r19 verdict item 1): the composite
  * lifecycle gates (q223-q228) cost ~20% of the bench suite, and their
  * data work is already minimal — the residual is a FLOOR of many
  * small engine steps (DML commits, index manifest commits, per-layer
  * writes, serve collects) that per-query wall times cannot attribute.
  * This records dotted-path phase timings per gate into an in-memory
  * accumulator the bench main snapshots into `bench_phases.json`
  * beside the sidecar, so "cut the biggest term" is a read, not a
  * guess.
  *
  * Recording is driver-side and context-scoped: `withGate(name)` marks
  * the current thread as timing gate `name`; `Phases("step") { ... }`
  * inside any engine call then accumulates wall seconds under
  * `step` (nested calls dot-join: `sync.frag`). Outside a gate
  * context — Verify runs, ScalaTest, library users — `apply` is a
  * zero-allocation passthrough, so instrumented engine code pays
  * nothing in production paths.
  *
  * Naming convention (review r20): ENGINE steps use bare names
  * (`frag_write`, `cells_write`) and rely on the dot-join for
  * context; the GATE supplies the lifecycle prefix by wrapping its
  * CALL (`Phases("sync") { CALL ann_sync }` -> `sync.frag_write`).
  * Prefixing inside the engine would double up (`sync.sync.frag`)
  * whenever a gate also wraps, and gates DO wrap — they time the
  * whole procedure call, overhead included. */
object Phases {
  private val gate = new ThreadLocal[String]
  private val stack = new ThreadLocal[List[String]] {
    override def initialValue(): List[String] = Nil
  }
  // gate -> (dotted phase path -> accumulated seconds)
  private val acc =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]]()

  /** Run `body` with phase recording attributed to `name`; clears any
    * previous accumulation for the gate so a re-run (bench min-of-2)
    * reports that run alone, not a sum across runs. */
  def withGate[T](name: String)(body: => T): T = {
    val prev = gate.get
    gate.set(name)
    acc.remove(name)
    try body finally gate.set(prev)
  }

  def apply[T](phase: String)(body: => T): T = {
    val g = gate.get
    if (g == null) body
    else {
      val outer = stack.get
      val path = (outer :+ phase).mkString(".")
      stack.set(outer :+ phase)
      val t0 = System.nanoTime()
      try body finally {
        stack.set(outer)
        val dt = (System.nanoTime() - t0) / 1e9
        acc.computeIfAbsent(g, _ =>
            new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]())
          .merge(path, dt, (a, b) => a + b)
      }
    }
  }

  /** (gate, nesting stack) of the CURRENT thread — capture where a
    * parallel task is SUBMITTED, replay on the worker via
    * [[withSnapshot]]. The r20 ADVICE finding: gate/stack are plain
    * ThreadLocals, so a `Phases(...)` call made from an ioPool thread
    * silently recorded nothing; snapshot+replay is the deliberate
    * propagation (an InheritableThreadLocal would capture at THREAD
    * CREATION, which for a cached pool is the wrong, stale gate). */
  def snapshot(): (String, List[String]) = (gate.get, stack.get)

  /** Run `body` attributing under a submitter's [[snapshot]]; the
    * worker thread's own state is restored after. Accumulation is a
    * concurrent sum, so OVERLAPPING parallel spans add — phase seconds
    * are attribution, not wall clock (the gate total stays the wall). */
  def withSnapshot[T](snap: (String, List[String]))(body: => T): T = {
    val (g, st) = snap
    val pg = gate.get; val ps = stack.get
    gate.set(g); stack.set(st)
    try body finally { gate.set(pg); stack.set(ps) }
  }

  /** Phase map recorded for `name`'s most recent withGate run. */
  def forGate(name: String): Map[String, Double] =
    Option(acc.get(name))
      .map(_.asScala.map { case (k, v) => k -> v.doubleValue }.toMap)
      .getOrElse(Map.empty)

  def clear(): Unit = acc.clear()
}
