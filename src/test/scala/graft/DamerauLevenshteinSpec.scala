package graft

import org.apache.spark.sql.functions._

import graft.functions.{DamerauLevenshtein, GraftFunctions}

/** The unrestricted Damerau-Levenshtein kernel vs the published values
 * and DuckDB-probed semantics. The d35 gate additionally cross-validates
 * it against DuckDB's independent built-in over every blocked candidate
 * pair of the customer table. */
class DamerauLevenshteinSpec extends SparkTestBase {
  import spark.implicits._

  test("kernel matches published / DuckDB-probed values") {
    // the UNRESTRICTED hallmark: OSA would say 3 (a transposed pair may
    // not be edited again); Lowrance-Wagner says 2 (swap CA, insert B)
    assert(DamerauLevenshtein.dist("CA", "ABC") == 2)
    assert(DamerauLevenshtein.dist("abc", "ca") == 2)
    // adjacent swaps cost 1 (plain Levenshtein charges 2)
    assert(DamerauLevenshtein.dist("ab", "ba") == 1)
    assert(DamerauLevenshtein.dist("teh", "the") == 1)
    assert(DamerauLevenshtein.dist("abcde", "badce") == 2)
    // degenerate to Levenshtein with no swaps involved
    assert(DamerauLevenshtein.dist("kitten", "sitting") == 3)
    assert(DamerauLevenshtein.dist("", "") == 0)
    assert(DamerauLevenshtein.dist("", "xyz") == 3)
    assert(DamerauLevenshtein.dist("xyz", "") == 3)
    assert(DamerauLevenshtein.dist("same", "same") == 0)
    // byte-level (DuckDB parity): two-byte é = substitute + insert
    assert(DamerauLevenshtein.dist("héllo", "hello") == 2)
    // the d35 motivating class: swapped digits in a fixed-prefix name
    assert(DamerauLevenshtein.dist(
      "Customer#000000012", "Customer#000000021") == 1)
    // length cap guards the quadratic DP allocation
    intercept[IllegalArgumentException] {
      DamerauLevenshtein.dist("x" * (DamerauLevenshtein.MaxLen + 1), "y")
    }
  }

  test("codegen and interpreted paths agree; symmetry; null propagation") {
    GraftFunctions.register(spark)
    val pairs = Seq(("CA", "ABC"), ("ab", "ba"), ("kitten", "sitting"),
      ("", "x"), ("same", "same"), ("abcde", "badce"))
      .toDF("a", "b")
    val viaExpr = pairs
      .select(GraftFunctions.damerau($"a", $"b").as("dl"),
        GraftFunctions.damerau($"b", $"a").as("ld"))
      .collect()
    val direct = pairs.as[(String, String)].collect()
      .map { case (a, b) => DamerauLevenshtein.dist(a, b) }
    viaExpr.map(_.getInt(0)).zip(direct).foreach { case (g, d) =>
      assert(g == d, "expression path must equal the static kernel")
    }
    viaExpr.foreach(r =>
      assert(r.getInt(0) == r.getInt(1), "DL distance is symmetric"))
    val n = Seq((Some("a"), Option.empty[String])).toDF("a", "b")
      .select(GraftFunctions.damerau($"a", $"b")).first()
    assert(n.isNullAt(0))
  }

  test("triangle inequality and unit-edit bounds on a name sample") {
    // property sweep: DL <= Levenshtein always; |len diff| <= DL
    val names = (0 until 40).map(i => s"Customer#0000000$i")
    for (a <- names; b <- names) {
      val dl = DamerauLevenshtein.dist(a, b)
      val lev = {
        // reference Levenshtein for the bound
        val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
          if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      assert(dl <= lev, s"DL must lower-bound Levenshtein: $a / $b")
      assert(math.abs(a.length - b.length) <= dl || a == b)
    }
  }
}
