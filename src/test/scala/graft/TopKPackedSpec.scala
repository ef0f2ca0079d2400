package graft

import org.apache.spark.sql.functions._
import graft.expr.{TopKHeap, TopKPacked}
import graft.functions.topk_packed

/** The bounded top-k TypedImperativeAggregate: heap mechanics against a
  * sort-based reference, serialization round-trip (the shuffle path),
  * partial-merge equivalence across many partitions, null/short-group
  * edges, and the SQL-registry surface. */
class TopKPackedSpec extends SparkSpec {
  import spark.implicits._

  test("TopKHeap keeps the k largest of any insertion order") {
    // deterministic pseudo-random order (no Random: repeatability)
    val xs = (1L to 200L).map(i => (i * 48271L) % 199L).distinct
    val h = new TopKHeap(5)
    xs.foreach(h.insert)
    assert(h.sortedDesc.toSeq === xs.sorted.reverse.take(5))
  }

  test("TopKHeap: fewer inputs than k returns all, descending") {
    val h = new TopKHeap(10)
    Seq(3L, 9L, 1L).foreach(h.insert)
    assert(h.sortedDesc.toSeq === Seq(9L, 3L, 1L))
  }

  test("serialize/deserialize round-trips the buffer") {
    val agg = TopKPacked(org.apache.spark.sql.graftshim.expression(col("x")), 4)
    val h = new TopKHeap(4)
    Seq(5L, -2L, 100L, 7L, 6L).foreach(h.insert)
    val back = agg.deserialize(agg.serialize(h))
    assert(back.sortedDesc.toSeq === h.sortedDesc.toSeq)
  }

  test("aggregate merges partials across partitions like a global sort") {
    // 1000 values spread over 8 partitions: partial heaps must merge to
    // the same answer a single sorted pass gives
    val vals = (1L to 1000L).map(i => (i * 75029L) % 99991L)
    val got = vals.toDF("v").repartition(8)
      .agg(topk_packed(col("v"), 7).as("top"))
      .as[Seq[Long]].head()
    assert(got === vals.sorted.reverse.take(7))
  }

  test("null inputs are skipped; all-null group yields empty array") {
    val got = Seq[Option[Long]](Some(3L), None, Some(8L), None)
      .toDF("v").agg(topk_packed(col("v"), 2)).as[Seq[Long]].head()
    assert(got === Seq(8L, 3L))
    val empty = Seq[Option[Long]](None, None)
      .toDF("v").agg(topk_packed(col("v"), 2)).as[Seq[Long]].head()
    assert(empty === Seq.empty[Long])
  }

  test("SQL surface: topk_packed registered like a built-in aggregate") {
    val s = spark.newSession()
    GraftExtensions.register(s)
    s.range(1, 50).createOrReplaceTempView("r")
    val got = s.sql(
      "SELECT topk_packed(id, 3) AS t FROM r").as[Seq[Long]].head()
    assert(got === Seq(49L, 48L, 47L))
  }
}
