package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DocStore, DocStoreCommitOps}

/** Property pins for the r13 encoding cores: the order-preserving
  * 8-byte payload encodings (what segment stats, the pruner and the
  * metadata aggregates all lean on), the GDS3 per-section codec, and
  * the version-log checkpoint line format. Pure driver-side — no
  * session needed. */
class EncodingSpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 2000): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // edge cases the generators must always include
  private val doubleEdges = Seq(0.0, -0.0, Double.MinPositiveValue,
    -Double.MinPositiveValue, Double.MaxValue, Double.MinValue,
    Double.PositiveInfinity, Double.NegativeInfinity, Double.NaN,
    1.0, -1.0, java.lang.Double.longBitsToDouble(1L), // subnormal
    java.lang.Double.longBitsToDouble(0x8000000000000001L)) // -subnormal
  private val genDouble: Gen[Double] = Gen.oneOf(
    Gen.oneOf(doubleEdges),
    Gen.chooseNum(Long.MinValue, Long.MaxValue)
      .map(java.lang.Double.longBitsToDouble)) // uniform over BIT patterns

  test("sortableDoubleBits: encoded signed-long order == Double.compare order") {
    // java.lang.Double.compare's TOTAL order: -Inf < ... < -0.0 < 0.0
    // < ... < +Inf < NaN. The stored encoding preserves this exactly
    // (r13 ADVICE: raw sign bit kept in DATA; SQL's -0.0 == 0.0 is
    // handled at the STATS boundary by sortableDoubleStatBits below).
    val prop = Prop.forAll(genDouble, genDouble) { (a, b) =>
      val (ea, eb) = (DocStore.sortableDoubleBits(a),
        DocStore.sortableDoubleBits(b))
      val cmp = java.lang.Double.compare(a, b)
      java.lang.Long.compare(ea, eb).sign == cmp.sign
    }
    check(prop)
  }

  test("sortableDoubleBits: decode(encode(d)) is d bit-for-bit incl -0.0 (canonical NaN)") {
    val prop = Prop.forAll(genDouble) { d =>
      val back = DocStore.doubleFromSortableBits(DocStore.sortableDoubleBits(d))
      if (d.isNaN) back.isNaN
      else java.lang.Double.doubleToLongBits(back) ==
        java.lang.Double.doubleToLongBits(d) // -0.0 stays -0.0
    }
    check(prop)
  }

  test("sortableDoubleStatBits: SQL-equal values meet at one encoded point") {
    // the stats/pruning twin: ±0.0 collapse, everything else matches
    // the stored encoding — so a bound folded from stat bits and a
    // literal encoded with stat bits agree for every SQL comparison
    assert(DocStore.sortableDoubleStatBits(-0.0d) ==
      DocStore.sortableDoubleStatBits(0.0d))
    assert(DocStore.sortableDoubleBits(-0.0d) == DocStore.EncodedNegZero)
    val prop = Prop.forAll(genDouble) { d =>
      if (d == 0.0d) DocStore.sortableDoubleStatBits(d) ==
        DocStore.sortableDoubleBits(0.0d)
      else DocStore.sortableDoubleStatBits(d) ==
        DocStore.sortableDoubleBits(d)
    }
    check(prop)
  }

  test("deflate/inflate: lossless round-trip over arbitrary byte arrays") {
    val genBytes: Gen[Array[Byte]] = Gen.oneOf(
      Gen.const(Array.empty[Byte]),
      Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
      // compressible and incompressible shapes
      Gen.chooseNum(1, 1 << 16).map(n => Array.fill[Byte](n)(42)),
      Gen.chooseNum(1, 1 << 14).map { n =>
        val r = new scala.util.Random(n) // deterministic per size
        Array.fill[Byte](n)(r.nextInt().toByte)
      })
    val prop = Prop.forAll(genBytes) { b =>
      val z = DocStore.deflate(b)
      java.util.Arrays.equals(DocStore.inflate(z, b.length), b)
    }
    check(prop, n = 300)
    // a payload truncated into its DATA fails loudly, never returns
    // short output (losing only trailer bytes is recoverable — the
    // format is length-framed, rawLen is the authority)
    val z = DocStore.deflate(Array.fill[Byte](1024)(7))
    intercept[Exception] {
      DocStore.inflate(java.util.Arrays.copyOf(z, z.length / 2), 1024)
    }
  }

  test("checkpoint lines: exotic segment names round-trip the file format") {
    // names with the format's own delimiters and non-ASCII must
    // survive the URL-encoded line form (partition dirs put '=' and
    // '/' in manifest-relative names; values can be anything)
    val genName: Gen[String] = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(',', ';', '=', '/', '%', '\n', 'é', '語')))
      .map(_.mkString.take(40))
    val genLine = for {
      v <- Gen.chooseNum(1L, 1000000L)
      millis <- Gen.chooseNum(0L, 4102444800000L)
      nSegs <- Gen.chooseNum(0L, 100000L)
      rows <- Gen.chooseNum(0L, Long.MaxValue / 2)
      bytes <- Gen.chooseNum(0L, Long.MaxValue / 2)
      names <- Gen.listOf(genName)
    } yield (v, millis, nSegs, rows, bytes, names.distinct)
    val prop = Prop.forAll(Gen.listOf(genLine)) { rawLines =>
      val lines = rawLines.groupBy(_._1).map(_._2.head).toSeq // unique v
      val dir = java.nio.file.Files.createTempDirectory("ckpt_prop")
      try {
        // the append path persists the given numbers verbatim; the
        // segment encoder never emits empty names (the line format
        // treats "" as the empty newNames list), so filter those
        lines.foreach { case (v, m, ns, r, b, names) =>
          DocStoreCommitOps.appendCheckpointLineForTest(dir.toString,
            v, m, ns, r, b, names.filter(_.nonEmpty))
        }
        val back = DocStoreCommitOps.readCheckpoint(dir.toString)
        lines.forall { case (v, m, ns, r, b, names) =>
          back.get(v).exists(l => l.millis == m && l.nSegs == ns &&
            l.liveRows == r && l.bytes == b &&
            l.newNames == names.filter(_.nonEmpty))
        }
      } finally graft.core.Fs.deleteRecursively(dir)
    }
    check(prop, n = 60)
  }
}
