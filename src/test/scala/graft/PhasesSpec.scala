package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Phases

/** The phase-attribution accumulator behind `bench_phases.json` (r19
  * verdict item 1). Contract: a zero-cost passthrough outside a gate
  * context; dotted-path accumulation inside one; each `withGate` run
  * reports itself alone (the bench's min-of-2 re-runs must not sum). */
class PhasesSpec extends AnyFunSuite {

  test("no gate context: body runs, nothing records") {
    var ran = false
    val out = Phases("ungated") { ran = true; 41 + 1 }
    assert(ran && out == 42)
    assert(Phases.forGate("ungated").isEmpty)
  }

  test("gate context: dotted nesting, accumulation, per-run reset") {
    Phases.withGate("g1") {
      Phases("a") { Phases("b") { Thread.sleep(5) } }
      Phases("a") { () } // same phase twice accumulates under one key
    }
    val m1 = Phases.forGate("g1")
    assert(m1.keySet == Set("a", "a.b"), s"keys: ${m1.keySet}")
    assert(m1("a") >= m1("a.b") && m1("a.b") >= 0.004,
      s"outer phase must contain the inner: $m1")
    // a SECOND withGate run replaces the first (min-of-2 semantics:
    // the surviving map describes one run, never a sum across runs)
    Phases.withGate("g1") { Phases("c") { () } }
    assert(Phases.forGate("g1").keySet == Set("c"))
    // nested gates restore the outer gate on exit
    Phases.withGate("outer") {
      Phases.withGate("inner") { Phases("x") { () } }
      Phases("y") { () }
    }
    assert(Phases.forGate("inner").keySet == Set("x"))
    assert(Phases.forGate("outer").keySet == Set("y"))
    Phases.clear()
    assert(Phases.forGate("outer").isEmpty)
  }

  test("a throwing body still records its phase and unwinds the stack") {
    Phases.withGate("g2") {
      intercept[RuntimeException](Phases("boom") { throw new RuntimeException("x") })
      Phases("after") { () }
    }
    val m = Phases.forGate("g2")
    assert(m.keySet == Set("boom", "after"),
      s"failed phase must record and not corrupt nesting: ${m.keySet}")
  }
}
