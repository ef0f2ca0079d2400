package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.io.Writers

/** Bucketed co-located joins: writing both sides bucketed on the join key
  * with the same bucket count must make the subsequent join run with NO
  * exchange — the physical proof that the layout, not the optimizer,
  * carries the distribution requirement. This is the persisted-corpus
  * analogue of broadcast: the join cost at 100 TB becomes a per-bucket
  * local merge. */
class BucketedJoinSpec extends SparkSpec {

  test("join of two same-bucketed tables plans with zero exchanges and matches the plain join") {
    val dir = Files.createTempDirectory("bucketed").toString
    // broadcast would bypass the bucketed SortMergeJoin under test
    val session = spark.newSession()
    session.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    session.conf.set("spark.sql.adaptive.enabled", "false")

    val orders = session.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val lineitem = session.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    try {
      Writers.bucketedTable(orders, "b_orders", s"$dir/o", Seq("o_orderkey"), 8)
      Writers.bucketedTable(lineitem, "b_lineitem", s"$dir/l", Seq("l_orderkey"), 8)

      val joined = session.table("b_lineitem")
        .join(session.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.explainString(ExplainMode.fromString("simple"))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")

      val viaBuckets = joined.agg(
        count(lit(1)), sum(col("l_quantity") * col("o_totalprice")).cast("long"))
        .collect()(0)
      val plain = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)), sum(col("l_quantity") * col("o_totalprice")).cast("long"))
        .collect()(0)
      assert(viaBuckets === plain)
    } finally {
      session.sql("DROP TABLE IF EXISTS b_orders")
      session.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
