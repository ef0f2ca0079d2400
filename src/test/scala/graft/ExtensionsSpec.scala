package graft

/** The SQL surface of the custom expressions: after registration a plain
  * spark.sql query can use them like built-ins. */
class ExtensionsSpec extends SparkSpec {

  test("registered SQL functions work in spark.sql") {
    GraftExtensions.register(spark)
    val row = spark.sql("""
      SELECT normalize_key('São João  2ª') AS k,
             rolling_hash('abc') AS fp,
             simhash28(array(1L, 3L)) AS sh,
             sorted_jaccard(array('a','b'), array('b','c')) AS j
    """).collect()(0)
    assert(row.getString(0) === "SAO JOAO 2")
    // ((0*31+97)*31+98)*31+99 = 96354 (matches the DuckDB list_reduce probe)
    assert(row.getLong(1) === 96354L)
    // hashes 1 (bit0) and 3 (bits0,1): bit0 count=+2→1, bit1 count=0→0 ⇒ 1
    assert(row.getLong(2) === 1L)
    assert(row.getDouble(3) === 1.0 / 3)
  }

  test("the SparkSessionExtensions hook registers the same functions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; names covered above
    assert(GraftExtensions.functions.map(_._1).toSet ===
      Set("normalize_key", "simhash28", "rolling_hash", "sorted_jaccard",
        "topk_packed", "char_pairs"))
  }
}
