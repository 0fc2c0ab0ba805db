package graft

/** Smoke: every registered inventory query runs at sf0.001 and returns rows;
 * every oracle key exists in queries. Value-level correctness is covered by
 * the DuckDB oracle gate (tools/verify_local.sh replicates it). */
class QueriesSpec extends SparkTestBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, Sf).count() > 0)
    }
  }
}
