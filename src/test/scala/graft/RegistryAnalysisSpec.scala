package graft

import graft.queries.Registry

/** R9 bench-path regression (ADVICE r9): the driver regenerated
  * `events.parquet` with a new physical encoding (INT64 TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS, NTZ)) and every events-based query failed ANALYSIS
  * with DATATYPE_MISMATCH on the loader's nanos→µs arithmetic — invisible
  * to unit tests that build their own fixtures. This spec force-analyzes
  * EVERY non-heavy registry query against the driver's real testdata, so
  * any schema/type drift in the generated lake breaks the suite, not the
  * official sweep. (Heavy gates execute streams/writes at build time and
  * are exercised by their own specs.)
  */
class RegistryAnalysisSpec extends SparkSpec {

  test("every non-heavy registry query analyzes against driver testdata") {
    val dir = "/root/testdata/sf0.001"
    val light = Registry.all.map(_.name).filterNot(Registry.heavy).sorted
    val failures = light.flatMap { n =>
      try {
        SparkEntry.queries(n)(spark, dir).schema // forces full analysis
        None
      } catch {
        case e: Throwable =>
          Some(s"$n: ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).replace('\n', ' ').take(160))
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries fail analysis on $dir:\n${failures.mkString("\n")}")
  }

  test("events loader adapts to the on-disk ts encoding (µs NTZ today)") {
    val ev = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType.typeName === "timestamp_ntz")
    // the arithmetic the r9 regression broke: ts must support timestamp ops
    assert(ev.selectExpr("max(ts)", "min(ts)").count() === 1)
  }


  test("events loader still converts the legacy raw-nanos long encoding") {
    // the real testdata is µs NTZ since r9, so without this fixture the
    // LongType branch (every earlier generation's encoding, and what a
    // future regeneration could revert to) would be dead-untested —
    // written with a REAL INT64 TIMESTAMP(NANOS) annotation, the only
    // footer the probe accepts for the nanosAsLong path
    val tmp = java.nio.file.Files.createTempDirectory("events_nanos")
    graft.core.Fs.deleteOnExit(tmp)
    val baseNs = java.sql.Timestamp.valueOf("2024-03-01 10:15:30")
      .getTime * 1000000L + 123456789L // + 0.123456789 s in raw nanos
    EventLake.write(tmp.toString, Seq(
      org.apache.spark.sql.Row(1L, baseNs, 7L, "click", 1.5, "{}"),
      // +210 ns: .123456789 -> .123456999, same µs after flooring
      org.apache.spark.sql.Row(2L, baseNs + 210L, 7L, "view", 0.5, "{}")))
    val ev = graft.core.Tables.events(spark, tmp.toString)
    assert(ev.schema("ts").dataType.typeName === "timestamp_ntz")
    val ts = ev.orderBy("event_id").collect()
      .map(_.getAs[java.time.LocalDateTime]("ts"))
    // ns -> µs floor truncation, independent of the session timezone
    assert(ts(0) === java.time.LocalDateTime.parse("2024-03-01T10:15:30.123456"))
    assert(ts(1) === ts(0), "sub-µs nanos must floor, not round")
  }

  test("events loader refuses an UNANNOTATED int64 ts instead of guessing") {
    // a regeneration shipping plain epoch-micros INT64 must fail loudly,
    // not get silently floor-divided by 1000 into ~1000×-too-old values
    val tmp = java.nio.file.Files.createTempDirectory("events_plain_i64")
    graft.core.Fs.deleteOnExit(tmp)
    EventLake.write(tmp.toString, Seq(
      org.apache.spark.sql.Row(1L, 1709288130123456L, 7L, "click", 1.5, "{}")),
      annotated = false)
    val e = intercept[IllegalStateException] {
      graft.core.Tables.events(spark, tmp.toString)
    }
    assert(e.getMessage.contains("TIMESTAMP(NANOS)"), e.getMessage)
  }
}
