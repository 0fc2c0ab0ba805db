package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, JaroWinkler}

/** The Jaro-Winkler kernel vs the literature's published values and the
 * engine's determinism contract. The d24 gate additionally cross-validates
 * it against DuckDB's independent built-in over every blocked candidate
 * pair of the customer table. */
class JaroWinklerSpec extends SparkTestBase {
  import spark.implicits._

  private def close(a: Double, b: Double) = math.abs(a - b) < 1e-9

  test("kernel matches the published reference values") {
    // Winkler's canonical pairs (strcmp95 lineage)
    assert(close(JaroWinkler.sim("MARTHA", "MARHTA"), 0.9611111111111111))
    assert(close(JaroWinkler.sim("DIXON", "DICKSONX"), 0.8133333333333332))
    assert(close(JaroWinkler.sim("DWAYNE", "DUANE"), 0.84))
    assert(close(JaroWinkler.sim("TRATE", "TRACE"), 0.9066666666666667))
    // no shared prefix -> no Winkler bonus
    assert(close(JaroWinkler.sim("JELLYFISH", "SMELLYFISH"),
      0.8962962962962964))
    assert(close(JaroWinkler.sim("CRATE", "TRACE"), 0.7333333333333334))
    // bonus gated at the 0.7 boost threshold despite a shared prefix
    assert(close(JaroWinkler.sim("aaxxxxxx", "aayyyyyy"), 0.5))
    // identity / disjoint / empty edges (DuckDB parity: '' vs '' = 0)
    assert(JaroWinkler.sim("abc", "abc") == 1.0)
    assert(JaroWinkler.sim("a", "b") == 0.0)
    assert(JaroWinkler.sim("abc", "") == 0.0)
    assert(JaroWinkler.sim("", "") == 0.0)
    assert(JaroWinkler.sim("ab", "ba") == 0.0) // window excludes the swap
    // UTF-8 BYTE-level comparison (DuckDB parity on non-ASCII too —
    // probed: the é splits into two bytes neither matching 'e')
    assert(close(JaroWinkler.sim("héllo", "hello"), 0.84))
    // strcmp95 integer half-transpositions (the DuckDB-parity case the
    // gate caught: 3 out-of-order matches floor to t=1)
    assert(close(
      JaroWinkler.sim("Customer#000000012", "Customer#000000120"),
      0.4 + 0.6 * (2.0 + 17.0 / 18.0) / 3.0))
  }

  test("codegen and interpreted paths agree; symmetry holds") {
    GraftFunctions.register(spark)
    val pairs = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"),
      ("spark table", "spark tables"), ("", "x"), ("same", "same"))
      .toDF("a", "b")
    val viaExpr = pairs
      .select(GraftFunctions.jaroWinkler($"a", $"b").as("jw"),
        GraftFunctions.jaroWinkler($"b", $"a").as("wj"))
      .collect()
    val direct = pairs.as[(String, String)].collect()
      .map { case (a, b) => JaroWinkler.sim(a, b) }
    viaExpr.map(_.getDouble(0)).zip(direct).foreach { case (g, d) =>
      assert(g == d, "expression path must equal the static kernel")
    }
    viaExpr.foreach(r =>
      assert(r.getDouble(0) == r.getDouble(1), "JW is symmetric"))
    // null propagation
    val n = Seq((Some("a"), Option.empty[String])).toDF("a", "b")
      .select(GraftFunctions.jaroWinkler($"a", $"b")).first()
    assert(n.isNullAt(0))
  }
}
