package graft

import graft.ext.TextAnalysis
import graft.functions.GraftFunctions

/** NormalizeNfc semantics: composition of decomposed sequences, identity on
 * already-NFC text, null handling, and the cleanText composition. Unicode is
 * spelled in \u escapes throughout — the whole point is composed vs
 * decomposed spellings, which look identical rendered. */
class NormalizeNfcSpec extends SparkTestBase {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("composes decomposed sequences; already-NFC text unchanged") {
    val rows = Seq(
      "éclair",  // decomposed e + combining acute
      "café",    // trailing decomposed
      "plain ascii",
      "é composed").toDF("s")
    val out = rows.select(GraftFunctions.nfc($"s")).as[String].collect()
    assert(out(0) == "éclair")
    assert(out(1) == "café")
    assert(out(2) == "plain ascii")
    assert(out(3) == "é composed")
  }

  test("null in, null out; predicate path agrees") {
    val df = Seq[Option[String]](None, Some("é")).toDF("s")
    val out = df.select(GraftFunctions.nfc($"s")).as[Option[String]].collect()
    assert(out.toSeq == Seq(None, Some("é")))
    // filter pushes the expression through a predicate — must agree with
    // the projected form
    assert(df.filter(GraftFunctions.nfc($"s") === "é").count() == 1)
  }

  test("cleanText: NFC + control strip + whitespace collapse + trim") {
    val out = Seq(" a b   ć\td \n")
      .toDF("s").select(TextAnalysis.cleanText($"s")).as[String].collect()
    assert(out.head == "a b ć d")
  }
}
