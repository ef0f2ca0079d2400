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

  // ---------------------------------------------------------------- dec128

  private val decEdges: Seq[BigInt] = {
    val max38 = BigInt(10).pow(38) - 1
    Seq(BigInt(0), BigInt(1), BigInt(-1), BigInt(Long.MaxValue),
      BigInt(Long.MinValue), BigInt(Long.MaxValue) + 1,
      BigInt(Long.MinValue) - 1, max38, -max38)
  }
  private val genUnscaled: Gen[BigInt] = Gen.oneOf(
    Gen.oneOf(decEdges),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(BigInt(_)),
    for { // wide: beyond the 8-byte class, inside DECIMAL(38)
      hi <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      lo <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    } yield {
      val v = (BigInt(hi) << 64) + (BigInt(lo) - BigInt(Long.MinValue))
      val max38 = BigInt(10).pow(38) - 1
      ((v.abs mod (max38 + 1)) * v.signum.max(-1)).min(max38).max(-max38)
    })

  test("dec128Bytes: fixed 16 bytes, exact roundtrip, incl. negatives") {
    val prop = Prop.forAll(genUnscaled) { v =>
      val b = DocStore.dec128Bytes(v.bigInteger)
      b.length == 16 && BigInt(DocStore.dec128Of(b)) == v
    }
    check(prop)
  }

  test("dec128 segment stats: DecBound is the exact unscaled [min,max] and survives the manifest roundtrip") {
    val prop = Prop.forAll(Gen.nonEmptyListOf(genUnscaled)) { vs =>
      val enc = new DocStore.SegmentEncoder(nExtra = 1,
        dec128Extras = Set(0))
      vs.zipWithIndex.foreach { case (v, i) =>
        enc.add(i.toLong, 1L, "xx".getBytes, "s".getBytes, "t".getBytes,
          Array(DocStore.dec128Bytes(v.bigInteger): AnyRef))
      }
      // null values count, never move the bound
      enc.add(vs.length.toLong, 1L, "xx".getBytes, "s".getBytes,
        "t".getBytes, Array[AnyRef](null))
      val st = enc.stats(5)
      val ok = st.nulls == 1 && (st.bound match {
        case Some(DocStore.DecBound(lo, hi)) => lo == vs.min && hi == vs.max
        case _ => false
      })
      // manifest line render + parse preserves the envelope exactly
      val dir = java.nio.file.Files.createTempDirectory("dec_stats")
      try {
        DocStoreCommitOps.writeManifest(dir.toString,
          Seq(DocStore.Segment("part-00000.gds", vs.length + 1L, 0L,
            vs.length.toLong, 1L, stats = enc.stats)), "tok")
        val back = DocStore.readManifest(dir.toString).head.stats(5)
        ok && back == st
      } finally graft.core.Fs.deleteRecursively(dir)
    }
    check(prop, n = 200)
  }

  test("statsPruner: DecBound prunes scale-aware decimal literals; inexact scale and pre-widening LongBound stay sound") {
    import org.apache.spark.sql.sources._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_chars", LongType), StructField("lang", StringType),
      StructField("source", StringType), StructField("text", StringType),
      StructField("amt", DecimalType(38, 2))))
    // segment A: wide payloads, unscaled in [10^20, 2*10^20] (= values
    // 10^18.00 .. 2*10^18.00); segment B: pre-widening 8-byte history,
    // unscaled longs in [100, 200] (= values 1.00 .. 2.00)
    val segA = DocStore.Segment("a", 10, 0, 9, 1, stats = Map(5 ->
      DocStore.ColStat(0, Some(DocStore.DecBound(
        BigInt(10).pow(20), BigInt(2) * BigInt(10).pow(20))))))
    val segB = DocStore.Segment("b", 10, 10, 19, 1, stats = Map(5 ->
      DocStore.ColStat(0, Some(DocStore.LongBound(100L, 200L)))))
    def bd(s: String) = new java.math.BigDecimal(s)
    def prune(f: Filter) =
      DocStore.statsPruner(schema, Array(f))
    // equality inside A's envelope keeps A, drops B — and vice versa
    val eqWide = prune(EqualTo("amt", bd("1500000000000000000.00")))
    assert(eqWide(segA) && !eqWide(segB))
    val eqSmall = prune(EqualTo("amt", bd("1.50")))
    assert(!eqSmall(segA) && eqSmall(segB))
    // ranges: amt > 3*10^18 drops both; amt > 0.50 keeps both
    val gtAll = prune(GreaterThan("amt", bd("3000000000000000000.00")))
    assert(!gtAll(segA) && !gtAll(segB))
    val gtNone = prune(GreaterThan("amt", bd("0.50")))
    assert(gtNone(segA) && gtNone(segB))
    // a literal whose fraction does not fit scale 2 exactly DECLINES
    // (keeps everything) — rescaling would move the probe point
    val inexact = prune(EqualTo("amt", bd("1.505")))
    assert(inexact(segA) && inexact(segB))
    // LessThan against the wide envelope
    val ltWide = prune(LessThan("amt", bd("1.00")))
    assert(!ltWide(segA) && !ltWide(segB))
    val ltKeepB = prune(LessThan("amt", bd("1.75")))
    assert(!ltKeepB(segA) && ltKeepB(segB))
  }

  test("ADD COLUMN type matrix: clean nested accepts, bad leaves refuse with the variant path") {
    import org.apache.spark.sql.types._
    // r15: nested types with scalar-surface leaves are ACCEPTED (the
    // opaque payload class); only a bad LEAF refuses, and the message
    // still points at the variant-path workaround
    assert(DocStore.nestedRefusalReason(ArrayType(LongType)).isEmpty)
    assert(DocStore.nestedRefusalReason(
      StructType(Seq(StructField("a", LongType)))).isEmpty)
    assert(DocStore.nestedRefusalReason(
      MapType(StringType, LongType)).isEmpty)
    assert(DocStore.nestedRefusalReason( // nested-of-nested too
      ArrayType(StructType(Seq(StructField("s", StringType),
        StructField("w", DecimalType(24, 2)))))).isEmpty)
    val badLeaf = DocStore.nestedRefusalReason(ArrayType(BinaryType))
    assert(badLeaf.exists(m => m.contains("from_json") &&
      m.contains("q127_json_shred")))
    assert(DocStore.nestedRefusalReason(BinaryType)
      .exists(_.contains("unbase64")))
    assert(DocStore.nestedRefusalReason(DecimalType(38, 6)).isEmpty)
    assert(DocStore.nestedRefusalReason(DecimalType(12, 2)).isEmpty)
    assert(DocStore.nestedRefusalReason(DoubleType).isEmpty)
    // a bad-leaf nested evolved schema refuses at validation
    val bad = StructType(DocStore.SCHEMA.fields.toSeq :+
      StructField("tags", ArrayType(BinaryType)))
    val e = intercept[IllegalArgumentException](
      DocStore.validateEvolved(bad))
    assert(e.getMessage.contains("q127_json_shred"))
    // a clean nested evolved schema validates
    val good = StructType(DocStore.SCHEMA.fields.toSeq :+
      StructField("tags", ArrayType(StringType)))
    assert(DocStore.validateEvolved(good).map(_.name) == Seq("tags"))
  }

  test("nested payload codec: randomized round-trips over representative shapes") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.util.{GenericArrayData, ArrayBasedMapData}
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    // generators build CATALYST values; equality is checked leaf-wise
    // after a codec round-trip (raw double bits, exact decimal
    // unscaled values, string bytes)
    val genStr: Gen[AnyRef] = Gen.oneOf(
      Gen.const(null),
      Gen.asciiPrintableStr.map(UTF8String.fromString),
      Gen.const(UTF8String.fromString("héllo wörld é中")))
    val genD: Gen[AnyRef] = Gen.oneOf(
      Gen.const(null),
      genDouble.map(java.lang.Double.valueOf(_): AnyRef))
    val genWide: Gen[AnyRef] = Gen.oneOf(
      Gen.const(null),
      Gen.chooseNum(-999999999L, 999999999L).map { u =>
        Decimal(new java.math.BigDecimal(
          java.math.BigInteger.valueOf(u)
            .multiply(java.math.BigInteger.TEN.pow(13)), 2), 24, 2): AnyRef
      })
    val genLongArr: Gen[AnyRef] = Gen.oneOf(
      Gen.const(null),
      Gen.listOfN(5, Gen.oneOf(
        Gen.const(null),
        Gen.chooseNum(Long.MinValue, Long.MaxValue)
          .map(java.lang.Long.valueOf(_): AnyRef)))
        .map(l => new GenericArrayData(l.toArray[Any]): AnyRef))
    val st = StructType(Seq(StructField("d", DoubleType),
      StructField("s", StringType), StructField("w", DecimalType(24, 2)),
      StructField("a", ArrayType(LongType))))
    val mt = MapType(StringType, st)
    def leafEq(dt: DataType, x: Any, y: Any): Boolean = (x, y) match {
      case (null, null) => true
      case (null, _) | (_, null) => false
      case _ => dt match {
        case DoubleType =>
          val (a, b) = (x.asInstanceOf[java.lang.Double],
            y.asInstanceOf[java.lang.Double])
          if (a.isNaN) b.isNaN
          else java.lang.Double.doubleToLongBits(a) ==
            java.lang.Double.doubleToLongBits(b)
        case _: DecimalType =>
          x.asInstanceOf[Decimal].toJavaBigDecimal
            .compareTo(y.asInstanceOf[Decimal].toJavaBigDecimal) == 0
        case StringType => x.toString == y.toString
        case ArrayType(et, _) =>
          val (a, b) = (x.asInstanceOf[GenericArrayData],
            y.asInstanceOf[GenericArrayData])
          a.numElements() == b.numElements() &&
            (0 until a.numElements()).forall(i =>
              leafEq(et, a.array(i), b.array(i)))
        case s: StructType =>
          val (a, b) = (x.asInstanceOf[GenericInternalRow],
            y.asInstanceOf[GenericInternalRow])
          s.fields.indices.forall(i => leafEq(s.fields(i).dataType,
            if (a.isNullAt(i)) null else a.values(i),
            if (b.isNullAt(i)) null else b.values(i)))
        case m: MapType =>
          val (a, b) = (x.asInstanceOf[ArrayBasedMapData],
            y.asInstanceOf[ArrayBasedMapData])
          a.numElements() == b.numElements() &&
            (0 until a.numElements()).forall { i =>
              leafEq(m.keyType, a.keyArray.asInstanceOf[GenericArrayData].array(i),
                b.keyArray.asInstanceOf[GenericArrayData].array(i)) &&
                leafEq(m.valueType,
                  a.valueArray.asInstanceOf[GenericArrayData].array(i),
                  b.valueArray.asInstanceOf[GenericArrayData].array(i))
            }
        case _ => x == y
      }
    }
    val genStruct: Gen[AnyRef] = for {
      d <- genD; s <- genStr; w <- genWide; a <- genLongArr
    } yield new GenericInternalRow(Array[Any](d, s, w, a)): AnyRef
    val genMap: Gen[AnyRef] = for {
      n <- Gen.chooseNum(0, 4)
      keys <- Gen.listOfN(n, Gen.asciiPrintableStr) // keys non-null
      vals <- Gen.listOfN(n, Gen.oneOf(Gen.const(null), genStruct))
    } yield new ArrayBasedMapData(
      new GenericArrayData(keys.map(UTF8String.fromString).toArray[Any]),
      new GenericArrayData(vals.toArray[Any])): AnyRef
    val prop = Prop.forAll(genMap) { v =>
      val holder = new GenericInternalRow(Array[Any](v))
      val back = DocStore.nestedOf(mt, DocStore.nestedBytes(mt, holder, 0))
      leafEq(mt, v, back)
    }
    check(prop, n = 500)
  }

  test("nested payload codec round-trips arrays, maps, structs and nesting") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.catalyst.util.{GenericArrayData, ArrayBasedMapData}
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    def roundtrip(dt: DataType, v: Any): Any = {
      val holder = new GenericInternalRow(Array[Any](v))
      DocStore.nestedOf(dt, DocStore.nestedBytes(dt, holder, 0))
    }
    // array of long with interior null
    val at = ArrayType(LongType)
    val a = roundtrip(at, new GenericArrayData(Array[Any](1L, null, -3L)))
      .asInstanceOf[GenericArrayData]
    assert(a.numElements() == 3 && a.getLong(0) == 1L &&
      a.isNullAt(1) && a.getLong(2) == -3L)
    // struct with string + wide decimal + null field
    val st = StructType(Seq(StructField("s", StringType),
      StructField("w", DecimalType(24, 2)), StructField("b", BooleanType)))
    val wide = org.apache.spark.sql.types.Decimal(
      new java.math.BigDecimal("123456789012345678901.25"), 24, 2)
    val r = roundtrip(st, new GenericInternalRow(Array[Any](
      UTF8String.fromString("héllo"), wide, null)))
      .asInstanceOf[GenericInternalRow]
    assert(r.getUTF8String(0).toString == "héllo")
    assert(r.getDecimal(1, 24, 2).toJavaBigDecimal
      .compareTo(new java.math.BigDecimal("123456789012345678901.25")) == 0)
    assert(r.isNullAt(2))
    // map string -> array<double> (nested-of-nested), -0.0 preserved raw
    val mt = MapType(StringType, ArrayType(DoubleType))
    val m = roundtrip(mt, new ArrayBasedMapData(
      new GenericArrayData(Array[Any](UTF8String.fromString("k"))),
      new GenericArrayData(Array[Any](
        new GenericArrayData(Array[Any](-0.0d, 2.5d))))))
      .asInstanceOf[ArrayBasedMapData]
    assert(m.numElements() == 1)
    val inner = m.valueArray.getArray(0)
    assert(java.lang.Double.doubleToRawLongBits(inner.getDouble(0)) ==
      java.lang.Double.doubleToRawLongBits(-0.0d), "-0.0 sign preserved")
    assert(inner.getDouble(1) == 2.5d)
  }

  // ---------------------------------------- Bloom fold/seal properties

  test("bloom fold/seal: NO FALSE NEGATIVES at any fold ceiling or seal size") {
    // the soundness contract the pruner's drop rests on: every value
    // folded at ANY power-of-two ceiling, sealed down to ANY smaller
    // power of two, must still probe positive — across the long and
    // byte hash families and the serialization round trip
    val genCeilLog = Gen.choose(9, 16) // 512 .. 65536 bits
    val genLongs = Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue))
    val prop = Prop.forAll(genLongs, genCeilLog) { (vs, cl) =>
      val ceil = 1 << cl
      val bits = new Array[Long](ceil >> 6)
      vs.foreach(v => DocStore.bloomFoldHash(bits, ceil,
        DocStore.bloomHashLong(v)))
      val sealedBits = DocStore.bloomSeal(bits, ceil, vs.length.toLong)
      val m = sealedBits.length * 64
      val bf = DocStore.Bloom(DocStore.BLOOM_K,
        DocStore.bloomBytesToWords(DocStore.bloomWordsToBytes(sealedBits)))
      (m & (m - 1)) == 0 && m <= ceil &&
        vs.forall(v => bf.mightContain(DocStore.bloomHashLong(v)))
    }
    check(prop)
  }

  test("bloom byte-hash family: no false negatives, and the write/backfill ceilings agree") {
    val genBytes = Gen.listOf(Gen.nonEmptyListOf(
      Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    val prop = Prop.forAll(genBytes) { vs =>
      // the WRITE path folds at BLOOM_MAX_BITS; the ANALYZE backfill
      // folds at a smaller rows-derived ceiling — the sealed filters
      // must both answer positive for every folded value
      val a = new Array[Long](DocStore.BLOOM_MAX_BITS >> 6)
      val b = new Array[Long](DocStore.BLOOM_MIN_BITS >> 6)
      vs.foreach { v =>
        val h = DocStore.bloomHashBytes(v)
        DocStore.bloomFoldHash(a, DocStore.BLOOM_MAX_BITS, h)
        DocStore.bloomFoldHash(b, DocStore.BLOOM_MIN_BITS, h)
      }
      val fa = DocStore.Bloom(DocStore.BLOOM_K,
        DocStore.bloomSeal(a, DocStore.BLOOM_MAX_BITS, vs.length.toLong))
      val fb = DocStore.Bloom(DocStore.BLOOM_K,
        DocStore.bloomSeal(b, DocStore.BLOOM_MIN_BITS, vs.length.toLong))
      vs.forall { v =>
        val h = DocStore.bloomHashBytes(v)
        fa.mightContain(h) && fb.mightContain(h)
      }
    }
    check(prop, n = 500)
  }
}
