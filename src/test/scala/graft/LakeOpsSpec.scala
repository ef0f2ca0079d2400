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
    Registry.byName("q86_compaction").fn(spark, dir).collect() // runs the rewrite
    val out = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_compaction").toString
    val files = spark.read.parquet(out)
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

  test("q106: as-of reads see exact history — update applied, delete absent, v0 untouched") {
    import org.apache.spark.sql.functions._
    // run the operator (it materializes v0/v1 under graft_time_travel)
    graft.queries.Registry.byName("q106_time_travel")
      .fn(spark, "/root/testdata/sf0.001").collect()
    val tmp = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_time_travel")
    val v0 = spark.read.parquet(tmp.resolve("v0").toString)
    val v1 = spark.read.parquet(tmp.resolve("v1").toString)
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
