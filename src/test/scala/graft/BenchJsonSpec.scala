package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import graft.queries.Registry

/** The driver keeps only the last ~2000 chars of bench stdout and parses a
  * complete JSON line out of that window (BENCH_r04 `parsed:null` post-mortem:
  * 61 full-name query entries pushed the line past the buffer and its head
  * was truncated away). This spec replicates that parse against the REAL
  * registry, so adding queries can never silently regrow the line past the
  * buffer again. */
class BenchJsonSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  /** The driver-side parse replica: keep the last `window` chars of stdout,
    * return the last line in it that is a complete JSON object. */
  private def driverParse(stdout: String, window: Int = 2000): Option[com.fasterxml.jackson.databind.JsonNode] = {
    val tail = stdout.takeRight(window)
    tail.split("\n").reverseIterator
      .find(l => l.startsWith("{") && l.trim.endsWith("}"))
      .flatMap(l => scala.util.Try(mapper.readTree(l.trim)).toOption)
  }

  private def fakeTimings(names: Seq[String]): Seq[(String, Double, Option[String])] =
    names.zipWithIndex.map { case (n, i) =>
      // REALISTIC-STRESSED widths (recalibrated at 196 queries): long
      // fractions everywhere, most queries in the sub-10 s band (one
      // integer digit at the coarsest rung), a 12-query pathological
      // band over 100 s (three digits), and one failed query with
      // control chars in its message (must be escaped, not split the
      // line). The old profile put EVERY query past 12 s — a sweep
      // that slow is a broken environment, where degrading to the
      // LOUD per-query-map drop (third test below) is the designed
      // behavior, not a regression.
      if (i == 1) (n, -1.0, Some("SparkException: boom\nline2\t\"quoted\""))
      else if (i % 16 == 0) (n, 123.456789 + i, None)
      else (n, 0.87654321 + (i % 9), None)
    }

  test("compact line for the full registry survives the driver tail buffer") {
    val names = Registry.all.map(_.name).sorted
    val (compact, verbose) = Bench.render(fakeTimings(names), "/root/testdata/sf0.1")

    assert(compact.length <= 1900, s"compact bench line ${compact.length} chars — driver buffer is 2000")
    assert(!compact.contains("\n"))

    // simulate stdout: warm-up noise from Spark, then the compact line
    val stdout = ("x" * 5000) + "\nsome WARN log line\n" + compact + "\n"
    val parsed = driverParse(stdout)
    assert(parsed.isDefined, "driver replica failed to find a complete JSON line in the tail")
    val node = parsed.get
    assert(node.get("metric").asText == "total")
    assert(node.get("value").asDouble > 0)
    // full map when it fits; past the width floor the partial rung
    // keeps the slowest entries and ANNOUNCES the omission in-band
    // (errors are never part of the partial map, always in `errors`)
    val omitted = if (node.has("omitted")) node.get("omitted").asInt else 0
    if (omitted == 0) assert(node.get("queries").size == names.size)
    else {
      assert(node.get("queries").size > 0)
      assert(node.get("queries").size + omitted + node.get("errors").size
        == names.size)
    }
    assert(node.get("errors").size == 1)
    assert(node.get("sf").asText == "/root/testdata/sf0.1")
    // r15: past the uniform-1-decimal width the ladder lands on the
    // ADAPTIVE rung — every entry present, and the SLOWEST queries
    // (the ones perf analysis reads) keep sub-second resolution
    // instead of the old uniform integer collapse that rendered most
    // of the registry as 0 in the official artifact
    val slowest = fakeTimings(names).filter(_._2 > 0).maxBy(_._2)._1
    val slowKey = {
      val s = Bench.shortKeys(names)(slowest)
      if (s.length > 1 && s.head == 'q') s.tail else s
    }
    assert(node.get("queries").get(slowKey).asText.contains("."),
      s"slowest query $slowKey lost sub-second resolution: " +
        node.get("queries").get(slowKey))

    // verbose channel (stderr / $BENCH_OUT) keeps full names and full precision
    val v = mapper.readTree(verbose)
    assert(v.get("queries").size == names.size)
    names.foreach(n => assert(v.get("queries").has(n), s"verbose line missing $n"))
    // r15 verdict item 4: the sidecar (= verbose line) must reconcile —
    // per-query sum equals the reported wall, so fast-query regressions
    // are trackable from the committed artifact alone
    val qsum = {
      import scala.jdk.CollectionConverters._
      v.get("queries").elements().asScala.map(_.asDouble).filter(_ >= 0).sum
    }
    assert(math.abs(qsum - v.get("value").asDouble) < 1e-6 * math.max(1.0, qsum),
      s"verbose per-query sum $qsum != total ${v.get("value").asDouble}")
  }

  test("sidecar line carries official + min-of-sweeps series, both reconciling") {
    val names = Registry.all.map(_.name).sorted
    val timed = fakeTimings(names)
    // second sweep: half the queries ran faster, half slower (slower
    // must NOT lower the min), errored queries absent
    val second = timed.collect { case (n, v, None) =>
      n -> (if (n.hashCode % 2 == 0) v * 0.8 else v * 1.3) }.toMap
    val line = Bench.sidecarLine(timed, second, "/root/testdata/sf0.1")
    val v = mapper.readTree(line)
    import scala.jdk.CollectionConverters._
    val qs = v.get("queries")
    val qm = v.get("queries_min")
    // ADVICE r17: errored queries are OMITTED from both maps (their -1
    // sentinel would corrupt any external consumer's sum); they appear
    // only under `errors`. fakeTimings errors exactly one query.
    val erroredNames = timed.collect { case (n, _, Some(_)) => n }.toSet
    assert(erroredNames.size == 1)
    assert(qs.size == names.size - 1 && qm.size == names.size - 1)
    erroredNames.foreach { n =>
      assert(!qs.has(n) && !qm.has(n), s"errored $n must be absent from maps")
      assert(v.get("errors").has(n), s"errored $n must be named in errors")
    }
    val qsum = qs.elements().asScala.map(_.asDouble).filter(_ >= 0).sum
    val msum = qm.elements().asScala.map(_.asDouble).filter(_ >= 0).sum
    assert(math.abs(qsum - v.get("value").asDouble) < 1e-9 * math.max(1.0, qsum))
    assert(math.abs(msum - v.get("value_min").asDouble) < 1e-9 * math.max(1.0, msum))
    names.filterNot(erroredNames).foreach { n =>
      val o = qs.get(n).asDouble
      val m = qm.get(n).asDouble
      assert(m <= o + 1e-12, s"$n min $m > official $o")
      assert(m >= 0 && m >= o * 0.8 - 1e-9)
    }
    // a second-sweep error never poisons a valid official number
    val withErr = Bench.sidecarLine(timed, Map(names.head -> -1.0), "x")
    val ve = mapper.readTree(withErr)
    assert(ve.get("queries_min").get(names.head).asDouble ==
      ve.get("queries").get(names.head).asDouble)
    // r18 verdict item 3: the box-drift canary fields are present and
    // consistent with the min series (both canary queries are real,
    // carried registry entries — renaming either must break this pin)
    assert(names.contains(Bench.CanaryZero) &&
      names.contains(Bench.CanaryScale),
      "canary queries must exist in the registry")
    val c = v.get("canary")
    assert(c != null, "sidecar must carry the canary object")
    assert(c.get("zero").asText == Bench.CanaryZero)
    assert(c.get("scale").asText == Bench.CanaryScale)
    assert(c.get("zero_sec").asDouble ==
      qm.get(Bench.CanaryZero).asDouble)
    assert(c.get("scale_sec").asDouble ==
      qm.get(Bench.CanaryScale).asDouble)
    // r19 verdict item 4: with raw sweep series supplied, the sidecar
    // carries per-sweep totals + canaries AND the median of totals —
    // one artifact holding the sweep-to-sweep spread itself
    val rawSweeps = Seq(
      timed.collect { case (n, t, None) => n -> t }.toMap,
      timed.collect { case (n, t, None) => n -> t * 1.15 }.toMap,
      second)
    val lineS = Bench.sidecarLine(timed, second, "x", rawSweeps)
    val vs = mapper.readTree(lineS)
    val sw = vs.get("sweeps")
    assert(sw != null && sw.isArray && sw.size == 3,
      "sidecar must carry one entry per full timed sweep")
    val totals = (0 until 3).map(i => sw.get(i).get("total").asDouble)
    rawSweeps.zip(totals).foreach { case (m, t) =>
      val want = m.values.filter(_ >= 0).sum
      assert(math.abs(t - want) < 5e-3, s"sweep total $t != sum $want")
    }
    (0 until 3).foreach { i =>
      assert(sw.get(i).has("zero_sec") == rawSweeps(i)
        .get(Bench.CanaryZero).exists(_ >= 0))
      assert(sw.get(i).has("scale_sec") == rawSweeps(i)
        .get(Bench.CanaryScale).exists(_ >= 0))
    }
    val med = vs.get("value_median")
    assert(med != null, "sidecar must carry value_median")
    assert(math.abs(med.asDouble - totals.sorted.apply(1)) < 5e-3,
      s"median ${med.asDouble} must be the middle sweep total")
    // no sweeps supplied (filtered isolation runs) -> fields absent,
    // line still parses with every carried field intact
    assert(!v.has("sweeps") && !v.has("value_median"))
  }

  test("committed bench sidecar (when present) reconciles sum-vs-wall at full resolution") {
    // Bench.main writes the full-resolution verbose line to
    // bench_sidecar.json (repo-relative), committed per round. When the
    // file exists, pin the official artifact's internal consistency:
    // every registry query present, ms-precision values, sum == wall.
    val p = java.nio.file.Paths.get("bench_sidecar.json")
    assume(java.nio.file.Files.exists(p), "no committed sidecar yet")
    val v = mapper.readTree(java.nio.file.Files.readString(p).trim)
    assert(v.get("metric").asText == "total")
    import scala.jdk.CollectionConverters._
    val vals = v.get("queries").elements().asScala.map(_.asDouble).toVector
    val qsum = vals.filter(_ >= 0).sum
    assert(math.abs(qsum - v.get("value").asDouble) < 1e-6 * math.max(1.0, qsum),
      s"sidecar per-query sum $qsum != wall ${v.get("value").asDouble}")
    val names = Registry.all.map(_.name)
    // sidecar may lag a registry grown mid-round, but every recorded
    // query must still be a real registry entry
    val recorded = v.get("queries").fieldNames().asScala.toSet
    assert(recorded.subsetOf(names.toSet),
      s"sidecar has unknown queries: ${recorded -- names.toSet}")
    // r16 item 5: when the min-of-sweeps series is present (r17+
    // sidecars), it reconciles too and never exceeds the official
    if (v.has("queries_min")) {
      val qm = v.get("queries_min")
      assert(qm.size == v.get("queries").size)
      val msum = qm.elements().asScala.map(_.asDouble).filter(_ >= 0).sum
      assert(math.abs(msum - v.get("value_min").asDouble) <
        1e-6 * math.max(1.0, msum),
        s"sidecar min sum $msum != value_min ${v.get("value_min").asDouble}")
      v.get("queries").fieldNames().asScala.foreach { n =>
        assert(qm.get(n).asDouble <= v.get("queries").get(n).asDouble + 1e-9,
          s"$n: min exceeds official")
      }
    }
    // r19+ sidecars carry the drift canary; when present it must
    // match the min series it was derived from
    if (v.has("canary")) {
      val c = v.get("canary")
      assert(c.get("zero").asText == Bench.CanaryZero &&
        c.get("scale").asText == Bench.CanaryScale)
      if (v.has("queries_min")) {
        assert(c.get("zero_sec").asDouble ==
          v.get("queries_min").get(Bench.CanaryZero).asDouble)
        assert(c.get("scale_sec").asDouble ==
          v.get("queries_min").get(Bench.CanaryScale).asDouble)
      }
    }
  }

  test("short keys are the qNN prefix, falling back to full names on collision") {
    val ok = Bench.shortKeys(Seq("q26b_dedup_clusters", "q26_dedup_ngram_exact", "q01_daily"))
    assert(ok("q26b_dedup_clusters") == "q26b")
    assert(ok("q26_dedup_ngram_exact") == "q26")
    assert(ok("q01_daily") == "q01")
    val clash = Bench.shortKeys(Seq("q1_a", "q1_b", "q2_c"))
    assert(clash("q1_a") == "q1_a" && clash("q1_b") == "q1_b" && clash("q2_c") == "q2")
    // the real registry must have collision-free prefixes (compact width depends on it)
    val real = Bench.shortKeys(Registry.all.map(_.name))
    assert(real.values.toSeq.distinct.size == real.size)
    assert(real.values.forall(_.length <= 5), "a registry name fell back to its full form")
  }

  test("overflow past the 1900-char floor degrades to the partial slowest-first rung, loudly") {
    // enough synthetic colliding names to overflow every full-map rung:
    // the prefix collision forces full names into the keys
    val names = (1 to 200).map(i => f"q9_synthetic_overflow_case_$i%03d")
    val errBuf = new java.io.ByteArrayOutputStream()
    val prevErr = System.err
    val (compact, verbose) =
      try {
        System.setErr(new java.io.PrintStream(errBuf, true, "UTF-8"))
        Bench.render(fakeTimings(names), "/root/testdata/sf0.1")
      } finally System.setErr(prevErr)
    assert(compact.length <= 1900)
    // the partial rung keeps the SLOWEST entries, announces the
    // omission count in-band, and never loses an error entry
    val node = driverParse(compact + "\n").get
    assert(node.get("metric").asText == "total")
    val kept = node.get("queries").size
    val omitted = node.get("omitted").asInt
    assert(kept > 0 && omitted > 0, s"expected a partial map: $compact")
    assert(kept + omitted + node.get("errors").size == names.size)
    assert(node.get("errors").size == 1)
    // the kept entries are the slowest ones (the pathological band)
    val timings = fakeTimings(names)
    val slowest = timings.filter(_._2 > 0).maxBy(_._2)._1
    val slowKey = {
      val s = Bench.shortKeys(names)(slowest)
      if (s.length > 1 && s.head == 'q') s.tail else s
    }
    assert(node.get("queries").has(slowKey),
      s"partial map must keep the slowest query $slowKey")
    // … and the degradation is announced on stderr, not silent
    val warning = errBuf.toString("UTF-8")
    assert(warning.contains("BENCH NOTE") || warning.contains("BENCH WARNING"),
      s"expected a loud degradation note, got: '$warning'")
    // the verbose channel still has every query
    assert(mapper.readTree(verbose).get("queries").size == names.size)
  }

  test("pathological widths past even the partial rung drop the map LOUDLY and stay parseable") {
    // an error message so large the errors map alone overflows: the
    // final LOUD drop branch must still emit a parseable line whose
    // failure count survives (ADVICE r9: never read clean over failures)
    val names = (1 to 40).map(i => f"q8_pathological_drop_case_with_very_long_name_$i%03d")
    val timings = names.zipWithIndex.map { case (n, i) =>
      if (i < 39) (n, -1.0, Some(("boom " * 50) + i))
      else (n, 1.0, Option.empty[String])
    }
    val errBuf = new java.io.ByteArrayOutputStream()
    val prevErr = System.err
    val (compact, _) =
      try {
        System.setErr(new java.io.PrintStream(errBuf, true, "UTF-8"))
        Bench.render(timings, "/root/testdata/sf0.1")
      } finally System.setErr(prevErr)
    assert(compact.length <= 1900)
    val node = driverParse(compact + "\n").get
    assert(node.get("metric").asText == "total")
    // the failure signal survives in SOME form: an errors map or the
    // _failed count
    assert(node.get("errors").size > 0 ||
      node.get("errors").has("_failed"),
      s"failures must never read clean: $compact")
    val warning = errBuf.toString("UTF-8")
    assert(warning.contains("BENCH WARNING"),
      s"expected a loud drop warning, got: '$warning'")
  }

  test("error timings and pathological sf paths stay valid JSON") {
    val (compact, _) = Bench.render(
      Seq(("q1_x", 1.0, None), ("q2_y", -1.0, Some("msg with \"quote\" and \\slash"))),
      """/tmp/weird"dir\name""")
    val node = mapper.readTree(compact)
    assert(node.get("queries").get("q2").asDouble == -1.0)
    assert(node.get("sf").asText == """/tmp/weird"dir\name""")
  }

  test("emitAndExit is main's terminal statement and nothing prints after the compact line") {
    // r17 post-mortem (fourth parsed:null artifact): a StateStore
    // maintenance daemon logged a 1.3 KB WARN stack trace AFTER the
    // compact line and evicted its head from the driver's 2000-char
    // tail. The defense is a three-part contract in Bench.main's tail;
    // this pin reads the source so a refactor cannot silently drop any
    // part of it.
    val src = java.nio.file.Files.readString(
      java.nio.file.Paths.get("src/main/scala/graft/Bench.scala"))
    val code = src.linesIterator
      .map(_.replaceAll("//.*$", "").trim).filter(_.nonEmpty).mkString("\n")
    // 1. log silenced and the maintenance daemon stopped BEFORE stop().
    val offIdx   = code.indexOf("setLogLevel(\"OFF\")")
    val ssIdx    = code.indexOf("state.StateStore.stop()")
    val stopIdx  = code.indexOf("spark.stop()")
    assert(offIdx >= 0 && ssIdx >= 0 && stopIdx >= 0)
    assert(offIdx < stopIdx && ssIdx < stopIdx,
      "log-OFF and StateStore.stop() must precede spark.stop()")
    // 2. main's last statement is the emission helper (nothing after it
    //    before main's closing brace).
    val mainTail = code.substring(stopIdx)
    val emitCall = mainTail.indexOf("emitAndExit(compact, nFailed)")
    assert(emitCall >= 0, "main must end by delegating to emitAndExit")
    // 3. the helper's body is exactly flush / println(compact) / flush /
    //    unconditional sys.exit — returns Nothing, so no code of ours can
    //    run after the line even on a clean sweep.
    val helper = code.substring(code.indexOf("private def emitAndExit"))
    assert(helper.contains(": Nothing ="))
    // bound the examined text to the HELPER BODY: up to its closing
    // brace (first `}` — the body has no nested blocks), capped at 400
    // chars. The previous `max` picked the LARGER bound, so the pin
    // examined the rest of the file and would keep passing if the
    // emission lines moved outside the helper (review r18).
    val body = helper.substring(0,
      (helper.indexOf("}") + 1) min helper.length min 400)
    assert(body.contains("println(compact)"))
    assert(body.contains("System.out.flush()"))
    assert(body.contains("sys.exit(if (nFailed > 0) 1 else 0)"))
    assert(body.indexOf("println(compact)") < body.indexOf("sys.exit"),
      "the compact line must print before the exit")
  }
}
