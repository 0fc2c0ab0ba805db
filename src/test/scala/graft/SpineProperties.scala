package graft

import java.sql.Date

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.Transforms

/** Property-based tests of the ETL spine (SURVEY §5.4): random envelopes —
 * including missing fields, null structs, malformed JSON, multi-element
 * results arrays — never violate the pipeline invariants. Plain ScalaCheck
 * generators sampled under fixed seeds (the scalatest bridge artifact is
 * not in the offline cache), so failures replay exactly. */
class SpineProperties extends SparkTestBase {
  import spark.implicits._

  /** Deterministic samples: one per seed 1..n. */
  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val asOf = Date.valueOf("2026-01-01")

  private val genUuid: Gen[Option[String]] =
    Gen.option(Gen.uuid.map(_.toString))

  private val genDob: Gen[String] = for {
    y <- Gen.choose(1940, 2020)
    m <- Gen.choose(1, 12)
    d <- Gen.choose(1, 28)
  } yield f"$y-$m%02d-$d%02dT00:00:00.000Z"

  private final case class ResultFields(
      uuid: Option[String], dobYear: Int, first: String, last: String)

  /** A structured result: (fields, rendered JSON). */
  private val genResult: Gen[(ResultFields, String)] = for {
    uuid <- genUuid
    dob <- genDob
    first <- Gen.alphaStr.map(_.take(8))
    last <- Gen.alphaStr.map(_.take(8))
    country <- Gen.option(Gen.oneOf("UK", "FR", "MA"))
  } yield {
    val uuidJson = uuid.map(u => s""""$u"""").getOrElse("null")
    val countryJson = country.map(c => s""""$c"""").getOrElse("null")
    val json =
      s"""{"gender":"female","name":{"title":"Ms","first":"$first","last":"$last"},
         |"dob":{"date":"$dob","age":30},
         |"location":{"street":{"number":1,"name":"s"},"city":"c","state":"st",
         |"country":$countryJson,"postcode":9},
         |"email":"x@y.com","login":{"uuid":$uuidJson,"username":"u"},
         |"registered":{"date":"2015-07-02T11:22:33.444Z"}}""".stripMargin.replaceAll("\n", "")
    (ResultFields(uuid, dob.take(4).toInt, first, last), json)
  }

  private val genEnvelopeStructured: Gen[(List[ResultFields], String)] = for {
    k <- Gen.choose(0, 4)
    rs <- Gen.listOfN(k, genResult)
  } yield (rs.map(_._1), s"""{"results":[${rs.map(_._2).mkString(",")}]}""")

  private val genEnvelope: Gen[String] = genEnvelopeStructured.map(_._2)

  private val genDoc: Gen[String] = Gen.frequency(
    8 -> genEnvelope,
    1 -> Gen.const("""{"results":null}"""),
    1 -> Gen.alphaNumStr.map(s => s"not json $s"))

  private def runSpine(docs: List[String]) = {
    val raw = docs.toDF("value").select($"value".cast("binary").as("value"))
    Transforms.etlSpine(raw, asOf).as[graft.schema.UserProfile].collect()
  }

  test("invariants: no under-threshold ages, no null ids, bounded row count") {
    samples(Gen.listOfN(30, genDoc), 5).foreach { docs =>
      val rows = runSpine(docs)
      assert(rows.forall(_.age > 18))
      assert(rows.forall(_.id != null))
      // explode conservation: at most 4 results per envelope survive
      assert(rows.length <= docs.length * 4)
    }
  }

  test("full_name follows concat_ws semantics exactly (empty strings kept, nulls skipped)") {
    samples(Gen.listOfN(20, genEnvelopeStructured), 5).foreach { envs =>
      val rows = runSpine(envs.map(_._2))
      val expect = envs.flatMap(_._1)
        .filter(f => f.uuid.isDefined && 2026 - f.dobYear > 18)
        .map(f => s"${f.first} ${f.last}")  // both non-null in generator
        .sorted
      assert(rows.map(_.full_name).sorted.toSeq == expect)
    }
  }

  test("age matches year-difference semantics exactly") {
    samples(Gen.listOfN(20, genEnvelopeStructured), 5).foreach { envs =>
      val rows = runSpine(envs.map(_._2))
      // reference semantics: 2026 - dob-year, independent of month/day;
      // only rows with a non-null uuid and age > 18 survive
      val expectAges = envs.flatMap(_._1)
        .collect { case f if f.uuid.isDefined => 2026 - f.dobYear }
        .filter(_ > 18).sorted
      assert(rows.map(_.age).sorted.toSeq == expectAges)
    }
  }
}
