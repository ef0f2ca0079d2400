package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.queries.Registry

/** Hand-computed integer PageRank on a 3-edge bipartite graph — pins the
  * damping arithmetic and the floor-division order so a refactor can't
  * silently shift ranks while still passing the (self-consistent)
  * oracle replica. */
class GraphSpec extends SparkSpec {

  test("q85: three half-steps reproduce the hand-computed integer ranks") {
    val dir = Files.createTempDirectory("graph").toString
    val liSchema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType)))
    val day = Timestamp.valueOf("1995-06-01 00:00:00")
    def li(ok: Long, p: Long, sp: Long) =
      Row(ok, p, sp, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", day)
    // edges p1-s1, p1-s2, p2-s1 (the duplicate p1-s1 row must collapse)
    val rows = Seq(li(1, 1, 1), li(2, 1, 2), li(3, 2, 1), li(4, 1, 1))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), liSchema)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = Registry.byName("q85_graph_rank").fn(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // dp: p1=2 p2=1; ds: s1=2 s2=1; r0=10^6
    // s-step1: s1 = 150000+850000*1500000 div 10^6 = 1425000; s2 = 575000
    // p-step:  p1 = 150000+850000*(712500+575000) div 10^6 = 1244375
    //          p2 = 150000+850000*712500 div 10^6 = 755625
    // s-step2: s1 = 150000+850000*(622187+755625) div 10^6 = 1321140
    //          s2 = 150000+850000*622187 div 10^6 = 678858
    assert(out(1L) == ((2L, 1321140L)))
    assert(out(2L) == ((1L, 678858L)))
  }
}
