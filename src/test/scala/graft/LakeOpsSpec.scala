package graft

import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Layout invariants for the lake-maintenance operators — the oracle gate
  * proves content preservation; these prove the LAYOUT claims: record
  * caps and non-overlapping sort ranges for compaction (q86), bit
  * semantics and per-bucket dimension confinement for Z-order (q87). */
class LakeOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q86: rewritten files respect the record cap and have non-overlapping ship ranges") {
    // run the SAME rewrite the gate runs, into a dir this spec owns —
    // reading the gate's per-invocation temp dir is impossible by design,
    // and the old fixed /tmp path only kept passing on stale leftovers
    val out = java.nio.file.Files.createTempDirectory("graft_compaction_spec")
    graft.core.Fs.deleteOnExit(out)
    graft.queries.LakeOps.compactionRewrite(spark, dir, out.toString)
    val files = spark.read.parquet(out.toString)
      .groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("n"),
        // NTZ timestamps collect as LocalDateTime; epoch-second longs
        // keep the range comparison type-stable
        min(unix_timestamp(col("l_shipdate").cast("timestamp"))).as("lo"),
        max(unix_timestamp(col("l_shipdate").cast("timestamp"))).as("hi"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      // sort by (lo, hi): files sharing a boundary lo otherwise order
      // arbitrarily and a (lo=X,hi=Z) before (lo=X,hi=X) pair would
      // false-fail the non-overlap check
      .sortBy(f => (f._2, f._3))
    assert(files.length > 1, "range partitioning should produce several files")
    assert(files.forall(_._1 <= 100000L), "maxRecordsPerFile violated")
    // range partitioning on (shipdate, orderkey, linenumber): consecutive
    // files may only touch at an exact boundary date, never overlap past it
    files.sliding(2).foreach { case Array((_, _, hiPrev), (_, loNext, _)) =>
      assert(loNext >= hiPrev,
        s"file ranges overlap: next starts $loNext before previous ends $hiPrev")
    }
  }

  test("q104: the manifest actually skips files, and skips none it needs") {
    val (files, total, _) = graft.queries.LakeOps.manifestPrunedFiles(
      spark, "/root/testdata/sf0.001", "1995-01-01", "1995-04-01")
    // the range layout spreads ~7 years over 8 files: a single quarter
    // must hit a strict subset (this is the point of the operator) …
    assert(files.nonEmpty && files.size < total,
      s"expected a strict subset: ${files.size} of $total files")
    // … and q104's oracle gate (full-table recompute) proves the subset
    // loses no rows; here we double-check the pruned count directly
    import org.apache.spark.sql.functions._
    val inWindow = (df: org.apache.spark.sql.DataFrame) => df.filter(
      col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-04-01").cast("timestamp")).count()
    val direct = inWindow(graft.core.Tables.orders(spark, "/root/testdata/sf0.001"))
    val pruned = inWindow(spark.read.parquet(files: _*))
    assert(pruned === direct)
  }

  test("q118: the 2-D manifest over the z-ordered lake skips files in BOTH dimensions") {
    val (files, total, _) = graft.queries.LakeOps.zorderPrunedFiles(
      spark, "/root/testdata/sf0.001", 32, 64, 4, 8)
    // 16 z-range files confine each dimension to sub-windows: a 32×32
    // box must hit a strict subset — the skipped IO q87's spans promise
    assert(files.nonEmpty && files.size < total,
      s"expected a strict subset: ${files.size} of $total files")
    import org.apache.spark.sql.functions._
    // no lost rows: pruned in-box count == full-table in-box count
    val direct = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .filter(col("l_partkey") % 256 >= 32 && col("l_partkey") % 256 < 64 &&
        col("l_suppkey") % 256 >= 4 && col("l_suppkey") % 256 < 8).count()
    val pruned = spark.read.parquet(files: _*)
      .filter(col("a") >= 32 && col("a") < 64 &&
        col("b") >= 4 && col("b") < 8).count()
    assert(pruned === direct)
  }

  test("q106: as-of reads see exact history — update applied, delete absent, v0 untouched") {
    import org.apache.spark.sql.functions._
    // run the operator (it materializes v0/v1 via the Scratch cache)
    graft.queries.Registry.byName("q106_time_travel")
      .fn(spark, "/root/testdata/sf0.001").collect()
    // resolve the published artifact: same (name, key) as the query; the
    // builder must never run here — the query above already built it
    val snap = graft.core.Scratch.materialize(
      "time_travel", "v1|/root/testdata/sf0.001|" +
        graft.core.Scratch.sourceSignature("/root/testdata/sf0.001")) { _ =>
      fail("q106 did not materialize its snapshots")
    }
    val v0 = spark.read.parquet(s"$snap/v0")
    val v1 = spark.read.parquet(s"$snap/v1")
    // deletes: keys ≡0 mod 97 exist in v0, not v1
    val del0 = v0.filter(col("key") % 97 === 0).count()
    assert(del0 > 0 && v1.filter(col("key") % 97 === 0).count() === 0)
    // updates: every surviving ≡3 mod 10 key gained exactly 1000 cents
    val joined = v0.select(col("key"), col("bal_cents").as("b0"))
      .join(v1.select(col("key"), col("bal_cents").as("b1")), "key")
      .withColumn("d", col("b1") - col("b0"))
    assert(joined.filter(col("key") % 10 === 3 && col("d") =!= 1000L).count() === 0)
    assert(joined.filter(col("key") % 10 =!= 3 && col("d") =!= 0L).count() === 0)
  }

  test("q87: InterleaveBits semantics and per-bucket dimension confinement") {
    // unit semantics: a=0b101 -> bits 0,4 set; b=0b011 -> bits 1,3 set
    assert(graft.expr.InterleaveBits.compute(5L, 3L) == 27L)
    assert(graft.expr.InterleaveBits.compute(0L, 0L) == 0L)
    assert(graft.expr.InterleaveBits.compute(65535L, 0L) == 0x55555555L)
    assert(graft.expr.InterleaveBits.compute(0L, 65535L) == 0xAAAAAAAAL)
    // locality: bucket = top 3 bits of each dimension -> every bucket
    // confines both dimensions to a 32-value window (vs 256 unclustered)
    val rows = Registry.byName("q87_zorder").fn(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 31L, s"a span too wide: $r")
      assert(r.getLong(5) - r.getLong(4) <= 31L, s"b span too wide: $r")
    }
  }
}
