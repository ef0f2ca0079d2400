package graft

import java.nio.charset.Charset
import java.nio.file.Files
import graft.core.Tables
import graft.io.Readers

/** Round-2 verdict item 7: loader conf side effects must not leak into the
  * caller's session. Both legacy flags are consulted when the scan
  * EXECUTES, so the loaders scope them to a cloned session attached to the
  * relation — this spec proves (a) the caller session is untouched and
  * (b) the returned lazy frame still executes correctly afterwards. */
class TablesConfScopeSpec extends SparkSpec {

  private val NanosKey = "spark.sql.legacy.parquet.nanosAsLong"
  private val CharsetKey = "spark.sql.legacy.javaCharsets"

  test("events(): caller conf untouched, frame executes, ts is NTZ") {
    spark.conf.unset(NanosKey)
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(spark.conf.get(NanosKey) === "false", "caller session was mutated")
    assert(ev.count() > 0, "scoped frame must execute after the loader returns")
    assert(ev.schema("ts").dataType.typeName === "timestamp_ntz")
    // a second loader call is independent and also executes
    assert(Tables.events(spark, "/root/testdata/sf0.001").count() === ev.count())
  }

  test("scoped clones inherit the caller's RUNTIME conf (not just builder conf)") {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false") // runtime set — a bare newSession drops it
      val clone = graft.core.Sessions.scoped(spark, NanosKey -> "true")
      assert(clone.conf.get(key) === "false", "runtime conf lost on the clone")
      assert(clone.conf.get(NanosKey) === "true")
      assert(spark.conf.get(NanosKey) === "false", "override leaked to caller")
    } finally spark.conf.set(key, prev)
  }

  test("csvWithEncodingRetry cp1252: caller conf untouched, frame executes") {
    spark.conf.unset(CharsetKey)
    val dir = Files.createTempDirectory("conf_scope")
    val p = dir.resolve("w1252.csv")
    // 0x93/0x94 smart quotes decode in cp1252 but are invalid UTF-8
    Files.write(p, "col_a;col_b\n“ola”;1\n".getBytes(Charset.forName("windows-1252")))
    val df = Readers.csvWithEncodingRetry(spark, p.toString, sep = ";")
    assert(spark.conf.get(CharsetKey) === "false", "caller session was mutated")
    val rows = df.collect()
    assert(rows.length === 1 && rows(0).getString(0) === "“ola”")
  }
}
