package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.queries.Registry

/** Funnel-order semantics for q83: stage advancement must respect event
  * ORDER (a click before any view is not a funnel click), and latency
  * only accrues for completed funnels. */
class FunnelSpec extends SparkSpec {

  test("q83: order-respecting stages — pre-view clicks don't advance the funnel") {
    val dir = Files.createTempDirectory("funnel").toString
    import EventLake.ns
    var id = 0L
    def ev(u: Long, t: String, ty: String): Row = { id += 1; Row(id, ns(t), u, ty, 0.0, "{}") }
    val rows = Seq(
      // u1: full funnel, 60s view->purchase
      ev(1, "2024-01-01 10:00:00", "view"),
      ev(1, "2024-01-01 10:00:30", "click"),
      ev(1, "2024-01-01 10:01:00", "purchase"),
      // u2: click BEFORE view -> stage 1 only
      ev(2, "2024-01-01 10:00:00", "click"),
      ev(2, "2024-01-01 10:00:30", "view"),
      // u3: purchase before click -> stage 2 (view+click, no ordered purchase)
      ev(3, "2024-01-01 10:00:00", "view"),
      ev(3, "2024-01-01 10:00:10", "purchase"),
      ev(3, "2024-01-01 10:00:20", "click"),
      // u4: no funnel events at all -> stage 0
      ev(4, "2024-01-01 10:00:00", "error"),
      // u5: full funnel at the SAME second (>= bounds are inclusive)
      ev(5, "2024-01-01 12:00:00", "view"),
      ev(5, "2024-01-01 12:00:00", "click"),
      ev(5, "2024-01-01 12:00:00", "purchase"))
    EventLake.write(dir, rows)
    val out = Registry.byName("q83_funnel").fn(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    assert(out(0) == ((1L, None)))          // u4
    assert(out(1) == ((1L, None)))          // u2
    assert(out(2) == ((1L, None)))          // u3
    assert(out(3) == ((2L, Some(60L))))     // u1 (60s) + u5 (0s)
  }
}
